package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in typed `mapPartitions`
  * batches (the Scala twin of `mapInPandas` — one JVM pass per
  * partition, no per-row UDF dispatch).
  *
  * Decode is REAL for every format pure JVM code can parse: RIFF/WAVE
  * PCM16 ([[decodeWav]]), uncompressed 24-bpp BMP ([[decodeBmp]]),
  * PNG ([[decodePng]] — DEFLATE via `java.util.zip.Inflater` + the
  * five row filters, CRC-checked chunk walk), GIF87a/89a
  * ([[decodeGif]] — LZW with dynamic code widths), and baseline JPEG
  * — grayscale ([[decodeJpeg]]) and YCbCr 4:2:0/4:4:4 color
  * ([[decodeJpegColor]]): DQT/DHT table parsing, interleaved-MCU
  * entropy decode with DC prediction, dequant, full 2D IDCT,
  * fixed-point color transform — each graded by a formula-oracle hash
  * compare that fails on any bit-level decode error. Only remaining
  * NATIVE-CODEC formats (MP3/H.264 — no codec libs in this
  * environment) still ride `decodeStub`, which derives
  * deterministic fake dimensions from the payload, clearly marked.
  * Everything around the stub — schema, partitioning, batch
  * iteration, byte-level feature extraction, frame sampling — is real
  * and tested. At 100 TB the payload column stays
  * columnar-compressed at rest, scans prune to (id, payload) only, and
  * feature extraction is embarrassingly parallel per partition.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, payload: Array[Byte],
      meta: Map[String, String])

  case class MediaFeatures(id: Long, modality: String, n_bytes: Int,
      mean_byte: Double, entropy: Double, width: Int, height: Int)

  case class Frame(id: Long, frame_idx: Int, frame_md5: String)

  /** STUB decode — stands in for an image/audio codec. Deterministic
    * fake dimensions derived from payload size (a real deploy swaps in
    * the actual decoder; the pipeline shape is unchanged). */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val w = 64 + (payload.length % 512)
    val h = 64 + ((payload.length / 2) % 512)
    (w, h)
  }

  /** Byte-level features + stub-decoded dimensions, one batch pass per
    * partition. Entropy folds the 256-bin histogram in byte order —
    * deterministic across runs and partitionings. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val counts = new Array[Long](256)
        var sum = 0L
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xFF
          counts(b) += 1
          sum += b
          i += 1
        }
        val n = r.payload.length.toDouble
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (counts(j) > 0) {
            val p = counts(j) / n
            entropy -= p * (Math.log(p) / Math.log(2.0))
          }
          j += 1
        }
        val (w, h) = decodeStub(r.payload)
        // empty payload: mean 0.0, not 0/0 NaN (DuckDB's sum over zero
        // rows is NULL — the oracle coalesces to the same 0.0)
        val meanByte = if (n == 0) 0.0 else sum / n
        MediaFeatures(r.id, r.modality, r.payload.length, meanByte, entropy, w, h)
      }
    }
  }

  case class PayloadWindow(id: Long, win_idx: Long, win_start: Long,
      mean_byte: Double, peak: Int)

  /** Hop/window framing over the payload (the audio spectrogram-frame
    * shape): windows of `windowLen` bytes every `hop` bytes, each with
    * mean byte (exact integer sum / window length) and peak byte —
    * integer features, so the frame is oracle-exact with no rounding.
    * Payloads shorter than one window emit nothing. */
  def windowFeatures(ds: Dataset[MediaRow], windowLen: Int, hop: Int)
      : Dataset[PayloadWindow] = {
    require(windowLen > 0 && hop > 0, "windowLen and hop must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val len = r.payload.length
        if (len < windowLen) Iterator.empty
        else (0L to (len - windowLen).toLong / hop).iterator.map { w =>
          val start = (w * hop).toInt
          var sum = 0L
          var peak = 0
          var i = start
          while (i < start + windowLen) {
            val b = r.payload(i) & 0xFF
            sum += b
            if (b > peak) peak = b
            i += 1
          }
          PayloadWindow(r.id, w, w * hop, sum.toDouble / windowLen, peak)
        }
      }
    }
  }

  /** Evenly-spaced fixed-length byte-window "frames" (the video
    * frame-sampling shape), identified by md5 for compact comparison. */
  def sampleFrames(ds: Dataset[MediaRow], nFrames: Int, frameLen: Int)
      : Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // one per partition
      rows.flatMap { r =>
        val len = r.payload.length
        if (len < frameLen) Iterator.empty
        else (0 until nFrames).iterator.map { i =>
          val start =
            if (nFrames == 1) 0
            else (i.toLong * (len - frameLen) / (nFrames - 1)).toInt
          md.reset()
          md.update(r.payload, start, frameLen)
          Frame(r.id, i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL decoders for UNCOMPRESSED containers (round 8). The "decode
  // is stubbed" caveat only ever applied to codec formats (JPEG/MP3/
  // H.264 need native libs this environment lacks); RIFF/WAVE PCM and
  // BMP are plain structured bytes a hundred lines of JVM code parse
  // completely. These are real parsers — wrong endianness, a missed
  // chunk, BMP's bottom-up row order or 4-byte row padding all change
  // the decoded samples, and the driver's oracle CATCHES that: the
  // graded queries synthesize payloads from a deterministic integer
  // formula, decode them through these parsers, and the SQL oracle
  // recomputes the same features from the formula directly — the
  // decoder must invert the encoder bit-for-bit or the hash compare
  // fails. decodeStub remains only for the codec modalities.
  // ------------------------------------------------------------------

  /** Deterministic PCM16 sample generator shared by [[synthWav]] and
    * the SQL oracle: floorMod(floorMod(key,65536)·2654435761 + i·40503,
    * 65536) − 32768 — pure integer, replayable as `((key%65536) *
    * 2654435761 + i*40503) % 65536 - 32768` on non-negative keys. The
    * key is pre-reduced mod 65536 BEFORE the multiply (sound: (key·c)
    * mod m == ((key mod m)·c) mod m) so the formula is overflow-free at
    * ANY doc_id on both engines — without it the JVM wraps silently
    * past key ≈ 3.47e9 while DuckDB's BIGINT arithmetic errors, and
    * the engines diverge (ADVICE r8). */
  def synthSample(key: Long, i: Long): Int =
    (java.lang.Math.floorMod(
      java.lang.Math.floorMod(key, 65536L) * 2654435761L + i * 40503L,
      65536L) - 32768L).toInt

  /** REAL WAV encoder (r12) from an arbitrary mono PCM16 sample array
    * — the write half of the codec ([[encodePng]]/[[encodeBmp]] for
    * audio): RIFF/WAVE header + LE 16-bit data chunk. Samples must fit
    * Int16 (loud error, never silent wraparound — a wrapped sample
    * would desync the formula oracle invisibly). */
  def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val s = samples(i)
      require(s >= -32768 && s <= 32767, s"wav: sample $i out of Int16: $s")
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** A valid RIFF/WAVE file: PCM (format 1), mono, 16-bit LE, `n`
    * [[synthSample]] samples. */
  def synthWav(key: Long, n: Int, sampleRate: Int): Array[Byte] =
    encodeWav(Array.tabulate(n)(i => synthSample(key, i)), sampleRate)

  case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** REAL RIFF/WAVE PCM16 parser: validates the RIFF/WAVE magic, walks
    * the chunk list (chunks are (4-byte tag, LE u32 length, payload,
    * odd-length pad) — unknown chunks are skipped, as the format
    * requires), reads `fmt ` (PCM only) and `data`. Malformed input is
    * a loud IllegalArgumentException, never garbage samples. */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(payload.length >= 44, "wav: truncated header")
    require(tag() == "RIFF", "wav: missing RIFF magic")
    buf.getInt // riff size (unchecked: streams may understate)
    require(tag() == "WAVE", "wav: not a WAVE container")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val t = tag()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"wav: chunk $t overruns")
      val next = buf.position() + len + (len & 1) // chunks pad to even
      t match {
        case "fmt " =>
          require(len >= 16, "wav: short fmt chunk")
          val fmt = buf.getShort
          require(fmt == 1, s"wav: not PCM (format $fmt)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(bits == 16, s"wav: only PCM16 supported, got $bits")
        case "data" =>
          val n = len / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort.toInt; i += 1 }
          samples = out
        case _ => // skip unknown chunk (LIST, cue, ...)
      }
      buf.position(math.min(next, payload.length))
    }
    require(sampleRate > 0 && samples != null, "wav: missing fmt or data chunk")
    WavAudio(sampleRate, channels, bits, samples)
  }

  /** EVEN-valued PCM16 sample generator for the audio-fingerprint
    * corpus ([[audioFingerprint64]]'s graded query): with kr =
    * floorMod(key, 32768), sample i = 2·floorMod(kr·2654435761 +
    * i·40503 + (kr·7 + 13)·i², 16384) − 16384, range [−16384, 16382].
    * Every sample EVEN so the gain-half twin (s >> 1) is an EXACT
    * scaling — energies scale by exactly 4 and the fingerprint's
    * gradient signs are provably invariant, not just probably; and the
    * perturbation headroom never leaves Int16. The KEY-DEPENDENT
    * QUADRATIC term is load-bearing (the [[phashPixelByte]] lesson): a
    * phase-only key dependence makes every clip the same sawtooth
    * shifted, and block ENERGIES — phase-insensitive by construction —
    * collide across keys within the banding radius. Key pre-reduced
    * mod 32768 for the same overflow-freedom as [[synthSample]]
    * (max term kr·2654435761 ≈ 8.7e13, quadratic ≈ 3.9e11 at i =
    * 1300: Long- and BIGINT-safe). */
  def synthSampleEven(key: Long, i: Long): Int = {
    val kr = java.lang.Math.floorMod(key, 32768L)
    (2L * java.lang.Math.floorMod(
      kr * 2654435761L + i * 40503L + (kr * 7L + 13L) * i * i,
      16384L) - 16384L).toInt
  }

  /** 64-bit GAIN-INVARIANT audio fingerprint of decoded PCM samples —
    * the audio half of the perceptual near-dup family ([[dhash64]] on
    * the time axis; cf. the derivative-sign bits of Haitsma & Kalker
    * 2002): the clip is split into 65 contiguous blocks by the exact
    * integer rule (block k = samples [k·n/65, (k+1)·n/65)), each
    * reduced to its energy E_k = Σ s², and bit k set iff E_{k+1} > E_k
    * — the temporal energy-envelope gradient signs. Properties the
    * dedup family relies on:
    *
    *   - GAIN-INVARIANT: uniform gain c scales every energy by c² and
    *     leaves every comparison unchanged (a requantized/normalized
    *     copy of the same recording fingerprints identically); on
    *     exactly-halved even PCM the invariance is exact in INTEGER
    *     arithmetic too, which is what the graded oracle pins;
    *   - localized edits move only the touched blocks' energies —
    *     near-dups land within a small Hamming radius and the banded
    *     machinery ([[graft.operators.Dedup.simhashPairsBucketed]])
    *     finds them without an all-pairs scan;
    *   - pure Long arithmetic (E_k <= n·32768²: overflow-safe past
    *     8.5e9 samples — two and a half DAYS of 44.1 kHz audio),
    *     replayable in SQL. */
  def audioFingerprint64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= 65, s"fingerprint needs >= 65 samples, got $n")
    val e = new Array[Long](65)
    var k = 0
    while (k < 65) {
      val from = (k.toLong * n / 65).toInt
      val to = ((k + 1).toLong * n / 65).toInt
      var acc = 0L
      var i = from
      while (i < to) {
        val s = samples(i).toLong
        acc += s * s
        i += 1
      }
      e(k) = acc
      k += 1
    }
    var h = 0L
    k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) h |= 1L << k
      k += 1
    }
    h
  }

  /** Deterministic pixel-byte generator shared by [[synthBmp]] and the
    * SQL oracle: byte k (logical top-down row-major (y, x, stored
    * channel) order) = ((key·31 + k)·97) mod 256. */
  def synthPixelByte(key: Long, k: Long): Int =
    java.lang.Math.floorMod((key * 31L + k) * 97L, 256L).toInt

  /** A valid uncompressed 24-bpp BMP (BITMAPINFOHEADER): rows stored
    * BOTTOM-UP with 4-byte row padding — the two layout quirks a naive
    * reader gets wrong, which is exactly why the oracle checks a
    * position-weighted checksum, not just a sum. */
  def synthBmp(key: Long, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](w * h * 3)
    var k = 0
    while (k < raw.length) { raw(k) = synthPixelByte(key, k).toByte; k += 1 }
    encodeBmp(w, h, raw)
  }

  /** REAL BMP encoder (r12) from an arbitrary logical top-down
    * row-major pixel array — the write half of [[decodeBmp]], byte
    * format identical to the historical [[synthBmp]] (which now
    * delegates here): BITMAPINFOHEADER, 24 bpp, bottom-up rows,
    * 4-byte row padding. */
  def encodeBmp(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3, "bmp encode: pixels != w*h*3")
    val stride = (w * 3 + 3) / 4 * 4
    val dataLen = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up
      buf.put(pixels, y * w * 3, w * 3)
      var pad = stride - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  case class BmpImage(width: Int, height: Int, bpp: Int,
      pixels: Array[Byte] /* logical top-down row-major, no padding */)

  /** REAL BMP parser (uncompressed 24-bpp BITMAPINFOHEADER): validates
    * the magic, honors the header's data offset, un-does the bottom-up
    * row order and strips the 4-byte row padding — the decoded pixel
    * array is logical top-down row-major. */
  def decodeBmp(payload: Array[Byte]): BmpImage = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(payload.length >= 54, "bmp: truncated header")
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "bmp: bad magic")
    buf.getInt; buf.getShort; buf.getShort
    val dataOffset = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"bmp: unsupported header size $hdrSize")
    val w = buf.getInt
    val h = buf.getInt
    require(w > 0 && h > 0, "bmp: top-down or empty bitmaps unsupported")
    buf.getShort // planes
    val bpp = buf.getShort.toInt
    require(bpp == 24, s"bmp: only 24-bpp supported, got $bpp")
    require(buf.getInt == 0, "bmp: compressed bitmaps unsupported")
    val stride = (w * 3 + 3) / 4 * 4
    require(payload.length >= dataOffset + stride * h, "bmp: truncated pixels")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (h - 1 - y) * stride // bottom-up
      System.arraycopy(payload, srcRow, out, y * w * 3, w * 3)
      y += 1
    }
    BmpImage(w, h, bpp, out)
  }

  /** Nearest-neighbor resize on the decoded pixels — the real
    * image-pipeline transform (thumbnailing for vision-model feature
    * extraction), exact integer source-index arithmetic:
    * src = (dst · srcDim) div dstDim. */
  def resizeNearest(img: BmpImage, tw: Int, th: Int): BmpImage = {
    require(tw > 0 && th > 0, "resize target must be positive")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3,
          out, (y * tw + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    BmpImage(tw, th, img.bpp, out)
  }

  // ------------------------------------------------------------------
  // Perceptual hashing (r12): the image half of the near-dup family —
  // a 64-bit difference hash over DECODED pixels, fed into the
  // existing banded-Hamming machinery (Dedup.simhashPairs: chunk-pair
  // bands, pigeonhole-exact to hamming 6, capped-bucket verify). The
  // whole chain is integer arithmetic, so the SQL oracle replays the
  // hash formula over the synth pixel formulas exactly
  // (mm_phash_dups).
  // ------------------------------------------------------------------

  /** 64-bit difference hash (dHash) of a decoded RGB image: the image
    * is shrunk to a 9x8 grid by [[resizeNearest]]'s exact integer
    * source-index rule (src = dst·srcDim div dstDim), each cell
    * reduced to integer luma `(299·c0 + 587·c1 + 114·c2) div 1000`,
    * and bit (y·8 + x) set iff luma(y, x+1) > luma(y, x) — horizontal
    * gradient signs, the classic dHash. Properties the dedup family
    * relies on:
    *
    *   - CODEC-INVARIANT for lossless formats: the same pixels
    *     re-encoded via PNG and BMP decode to the same byte triplets
    *     (both decoders emit logical top-down rows), so their hashes
    *     are EQUAL — a content-level dedup key no byte-level digest
    *     gives (the container bytes differ completely);
    *   - small pixel perturbations flip only the gradient bits whose
    *     sampled cells change — near-dups land within a small Hamming
    *     radius and banded LSH finds them without an all-pairs scan;
    *   - pure integer arithmetic over decoded bytes: deterministic,
    *     replayable in SQL, zero floats.
    *
    * Channel note: luma weights are applied to the decoded triplet in
    * STORAGE order (PNG: RGB, BMP: BGR). Grayscale content (r = g = b,
    * the corpus contract for the graded query — and the common case
    * for perceptual dedup after a luma transform) is layout-proof
    * since 299 + 587 + 114 = 1000 makes luma = the channel value
    * exactly; full-color cross-layout hashing would need a channel
    * swap the caller owns. */
  def dhash64(width: Int, height: Int, pixels: Array[Byte]): Long = {
    require(pixels.length == width * height * 3,
      "dhash: pixels != w*h*3")
    require(width >= 9 && height >= 8,
      s"dhash: image ${width}x$height smaller than the 9x8 grid")
    val g = resizeNearest(BmpImage(width, height, 24, pixels), 9, 8)
    def luma(x: Int, y: Int): Int = {
      val o = (y * 9 + x) * 3
      ((g.pixels(o) & 0xff) * 299 + (g.pixels(o + 1) & 0xff) * 587 +
        (g.pixels(o + 2) & 0xff) * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** The fixed-point DCT-II basis shared by [[phashDct64]] and the SQL
    * oracle: entry (u·32 + x) = rint(cos(π·(2x+1)·u/64) · 2^14), u in
    * 0..7, x in 0..31. Computed via StrictMath (bit-identical on every
    * JVM) and inlined into the oracle as VALUES literals (the SRP
    * hyperplane discipline), so both engines multiply the SAME
    * integers — no trig evaluation ever happens cross-engine. */
  val dctCosQ14: Array[Long] = {
    val t = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        t(u * 32 + x) = StrictMath.rint(
          StrictMath.cos(Math.PI * (2 * x + 1) * u / 64.0) * 16384.0).toLong
        x += 1
      }
      u += 1
    }
    t
  }

  /** 64-bit perceptual DCT hash (pHash) of a decoded RGB image — the
    * LOSSY-boundary companion to [[dhash64]]: the image is shrunk (or
    * grown) to a 32x32 grid by [[resizeNearest]]'s exact integer rule,
    * reduced to integer luma, transformed by a SEPARABLE fixed-point
    * 2D DCT-II over [[dctCosQ14]], and bit (u·8 + v − 1) set iff
    * low-frequency coefficient (u, v) exceeds the MEDIAN of the 63
    * non-DC coefficients (the 32nd smallest — an exact integer order
    * statistic, no quantile-interpolation ambiguity).
    *
    * Why a second perceptual hash: dHash compares ADJACENT cell lumas,
    * so high-frequency pixel noise — exactly what lossy JPEG
    * quantization injects — sits directly in its decision variable and
    * flips gradient bits wherever neighbors are close. The DCT hash
    * thresholds LOW-frequency coefficients against their median:
    * quantization noise spreads across the high-frequency coefficients
    * the hash never reads, and a uniform brightness shift lands in the
    * excluded DC term (the AC basis rows sum to ~0), so JPEG re-encodes
    * and luma offsets perturb few bits (MultimodalSpec pins both, with
    * dHash diverging on the same noisy inputs). All arithmetic is
    * exact-integer Long: |s1| <= 255·32·2^14 and |coef| <= that ·32·2^14
    * ≈ 7.0e16 < 2^63, so the SQL oracle replays the transform verbatim.
    *
    * Exactly 31 bits are set when the 63 coefficients are distinct
    * (strictly-greater-than-median); bit 63 is always 0, so the hash is
    * non-negative on both engines. Feeds [[graft.operators.Dedup]]'s
    * banded-Hamming machinery unchanged. */
  def phashDct64(width: Int, height: Int, pixels: Array[Byte]): Long = {
    require(pixels.length == width * height * 3,
      "phash: pixels != w*h*3")
    val g = resizeNearest(BmpImage(width, height, 24, pixels), 32, 32)
    val lum = new Array[Long](32 * 32)
    var i = 0
    while (i < 1024) {
      val o = 3 * i
      lum(i) = ((g.pixels(o) & 0xff) * 299 + (g.pixels(o + 1) & 0xff) * 587 +
        (g.pixels(o + 2) & 0xff) * 114) / 1000
      i += 1
    }
    // separable DCT: s1(u, y) = Σ_x lum(y, x)·C(u, x); coef(u, v) =
    // Σ_y s1(u, y)·C(v, y) — 8·32 dot products instead of 64·1024
    val s1 = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var acc = 0L
        var x = 0
        while (x < 32) {
          acc += lum(y * 32 + x) * dctCosQ14(u * 32 + x)
          x += 1
        }
        s1(u * 32 + y) = acc
        y += 1
      }
      u += 1
    }
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var y = 0
        while (y < 32) {
          acc += s1(u * 32 + y) * dctCosQ14(v * 32 + y)
          y += 1
        }
        coef(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var h = 0L
    i = 1
    while (i < 64) {
      if (coef(i) > med) h |= 1L << (i - 1)
      i += 1
    }
    h
  }

  /** Pixel formula for the perceptual-dedup synth family. NOT
    * [[synthPixelByte]]: that one is AFFINE in (key, i), so a dHash —
    * which only sees the mod-256 offset `key·31·97` — takes at most
    * 256 distinct values over all keys and unrelated images collide
    * within the match radius. The quadratic term breaks the affinity;
    * measured over 250 keys: zero unrelated pairs within hamming 3,
    * mean pairwise distance ~32 (ideal for 64 bits). */
  def phashPixelByte(key: Long, i: Long): Int =
    java.lang.Math.floorMod(
      (key * 31L + i) * 97L + (key * 7L + 13L) * i * i, 256L).toInt

  /** Synthetic GRAYSCALE pixel array for the perceptual-dedup oracle
    * family: pixel i carries ([[phashPixelByte]](key, i) + (key div
    * 256)·(59i + 17)) mod 256 on ALL THREE channels (so luma == the
    * formula value on any channel layout), with an optional
    * single-cell perturbation `(cy, cx)` — the pixel the 9x8 dHash
    * grid samples for that cell gets `(v + perturbDelta) mod 256`
    * (default 128, flipping at most the two gradient bits adjacent to
    * the cell; the DCT-hash query uses a SMALL delta so the
    * low-frequency coefficient shifts stay within its match radius).
    * The (key div 256) mixing term widens the content alphabet from
    * phashPixelByte's intrinsic 256 key classes to 65536 — without it
    * a 25k-gid corpus (sf1eq) piles ~98 image replicas per class and
    * the graded pair queries go output-quadratic in that depth
    * (measured 21x for 10x docs; the mm_video_dups lesson). It
    * vanishes for key < 256, so every small-gid fixture, probe
    * histogram, and spec pin is unchanged. The SQL oracle replays
    * base formula, mixing term, and perturbation rule verbatim. */
  /** Exact-integer horizontal 1-2-1 blur over an RGB frame —
    * out(x) = (in(x-1) + 2*in(x) + in(x+1)) // 4 per channel, x
    * CLAMPED at the borders. The canonical low-frequency-preserving
    * edit of the perceptual family (r14): it attacks exactly what
    * dHash keys on (adjacent-pixel gradients — measured mean dHash
    * drift 6.8 bits on the synth corpus) while the DCT hash's low
    * 8x8 spectrum survives (mean 5.0 bits, and 16% of content groups
    * land dHash > 3 && DCT <= 3 — the (F,T) agreement regime;
    * tools/BlurRegimeProbe compares the 1x3/1-2-1/3x3 candidates).
    * Floor division and clamping are replayed verbatim by the SQL
    * oracle (greatest/least + //). */
  def blurH121(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      "blurH121: pixels != w*h*3")
    val out = new Array[Byte](pixels.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val xl = math.max(0, x - 1)
        val xr = math.min(width - 1, x + 1)
        var ch = 0
        while (ch < 3) {
          val l = pixels((y * width + xl) * 3 + ch) & 0xFF
          val c = pixels((y * width + x) * 3 + ch) & 0xFF
          val r = pixels((y * width + xr) * 3 + ch) & 0xFF
          out((y * width + x) * 3 + ch) = ((l + 2 * c + r) / 4).toByte
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  def synthGrayImage(key: Long, w: Int, h: Int,
      perturbCell: Option[(Int, Int)] = None,
      perturbDelta: Int = 128): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    def value(i: Int): Int = java.lang.Math.floorMod(
      phashPixelByte(key, i) + (key / 256L) * (59L * i + 17L), 256L).toInt
    var i = 0
    while (i < w * h) {
      val v = value(i)
      px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte; px(3 * i + 2) = v.toByte
      i += 1
    }
    perturbCell.foreach { case (cy, cx) =>
      // the source pixel resizeNearest(9x8) samples for grid (cy, cx)
      val sy = cy * h / 8
      val sx = cx * w / 9
      val p = sy * w + sx
      val v = (value(p) + perturbDelta) % 256
      px(3 * p) = v.toByte; px(3 * p + 1) = v.toByte; px(3 * p + 2) = v.toByte
    }
    px
  }

  // ------------------------------------------------------------------
  // REAL PNG codec (round 9): the one COMPRESSED image format pure JVM
  // code covers completely — DEFLATE is java.util.zip, and the rest of
  // the spec (RFC 2083: chunk layout, CRC-32, the five scanline
  // filters) is exactly the bit-level arithmetic the formula-oracle
  // discipline catches. The encoder cycles through ALL five filter
  // types row by row, so a decoder that mis-implements any one of
  // Sub/Up/Average/Paeth reconstructs wrong bytes and fails the
  // oracle's position-weighted checksum.
  // ------------------------------------------------------------------

  private def pngChunk(buf: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    buf.write(len, 0, 4)
    val tb = typ.getBytes("US-ASCII")
    buf.write(tb, 0, 4)
    buf.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    buf.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** Paeth predictor (RFC 2083 §6.6): nearest of a (left), b (above),
    * c (above-left) to a+b−c, ties a > b > c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** A valid 8-bit RGB (color type 2) PNG of [[synthPixelByte]] pixels,
    * scanline filters CYCLING y mod 5 through None/Sub/Up/Average/
    * Paeth (every filter the spec defines — a decoder must invert all
    * of them), the filtered stream zlib-deflated, and the IDAT payload
    * SPLIT across two chunks (legal per spec; a reader that assumes
    * one IDAT truncates the stream). */
  def synthPng(key: Long, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](w * h * 3)
    var k = 0
    while (k < raw.length) { raw(k) = synthPixelByte(key, k).toByte; k += 1 }
    encodePng(w, h, raw)
  }

  /** REAL PNG encoder (r12) from an arbitrary logical top-down
    * row-major RGB pixel array — the write half of [[decodePng]],
    * byte format identical to the historical [[synthPng]] (which now
    * delegates here): filters cycling y mod 5, zlib DEFLATE, IDAT
    * split in two. */
  def encodePng(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
    require(raw.length == w * h * 3, "png encode: pixels != w*h*3")
    val bpr = w * 3
    val filtered = new Array[Byte](h * (bpr + 1))
    var y = 0
    while (y < h) {
      val f = y % 5
      filtered(y * (bpr + 1)) = f.toByte
      var i = 0
      while (i < bpr) {
        val x = raw(y * bpr + i) & 0xff
        val a = if (i >= 3) raw(y * bpr + i - 3) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * bpr + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) raw((y - 1) * bpr + i - 3) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        filtered(y * (bpr + 1) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered)
    defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    pngChunk(out, "IHDR", ihdr)
    val cut = z.length / 2
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
    pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // REAL GIF87a/89a codec (round 9): the second compressed image
  // format pure JVM code covers — LZW is ~100 lines of integer
  // bit-stream work (variable-width codes, clear/EOI, dictionary
  // growth incl. the KwKwK self-reference case), and the container
  // (logical screen descriptor, color table, sub-block framing) is
  // plain structured bytes. The encoder is a REAL dictionary LZW
  // compressor, so the decoder's dictionary reconstruction is
  // exercised for real — a wrong first-free-code, a missed width
  // bump, or a botched KwKwK entry all corrupt the pixel stream and
  // fail the formula oracle's position-weighted checksum.
  // ------------------------------------------------------------------

  /** Deterministic 64-entry palette shared by [[synthGif]] and the SQL
    * oracle: entry i = (floorMod(i·37, 256), floorMod(i·91 + 17, 256),
    * floorMod(i·53 + 101, 256)). */
  def gifPaletteByte(i: Int, c: Int): Int = c match {
    case 0 => Math.floorMod(i * 37, 256)
    case 1 => Math.floorMod(i * 91 + 17, 256)
    case _ => Math.floorMod(i * 53 + 101, 256)
  }

  /** GIF's little-endian 16-bit field writer, shared by every
    * container-emitting helper below. */
  private def gifU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** GIF89a signature + logical screen descriptor + the 64-entry
    * global color table from [[gifPaletteByte]] — the container
    * prefix shared by [[synthGif]] and [[synthGifAnimated]]. */
  private def writeGifHeader(out: java.io.ByteArrayOutputStream,
      w: Int, h: Int, minCode: Int): Unit = {
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = gifU16(out, v)
    u16(w); u16(h)
    out.write(0x80 | ((minCode - 1) << 4) | (minCode - 1)) // GCT
    out.write(0); out.write(0) // bg idx, aspect
    val nIdx = 1 << minCode
    var i = 0
    while (i < nIdx) {
      out.write(gifPaletteByte(i, 0)); out.write(gifPaletteByte(i, 1))
      out.write(gifPaletteByte(i, 2)); i += 1
    }
  }

  /** A valid GIF89a: 6-bit color depth (64-entry global table from
    * [[gifPaletteByte]]), one image, pixel index (y·w+x) =
    * [[synthPixelByte]](key, y·w+x) mod 64, and the index stream
    * LZW-compressed by a REAL dictionary encoder (variable code
    * width, clear code emitted when the table fills to 12 bits). */
  def synthGif(key: Long, w: Int, h: Int): Array[Byte] = {
    val nIdx = 64 // 6-bit palette
    val minCode = 6
    val idx = new Array[Int](w * h)
    var k = 0
    while (k < idx.length) { idx(k) = synthPixelByte(key, k) % nIdx; k += 1 }
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, w, h, minCode)
    def u16(v: Int): Unit = gifU16(out, v)
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local color table, not interlaced
    writeGifImageData(out, idx, minCode)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Frame `f` of the animated synth payload: pixel index (y·w+x) =
    * [[synthPixelByte]](key, f·w·h + y·w + x) mod 64 — the frame
    * offset keeps every frame's content distinct, so a decoder that
    * returns frame 0 N times (or desyncs the LZW dictionary across
    * image blocks) fails the position-weighted oracle checksum. */
  def synthGifAnimated(key: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(frames >= 1, "gif: at least one frame")
    val minCode = 6
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, w, h, minCode)
    def u16(v: Int): Unit = gifU16(out, v)
    var f = 0
    while (f < frames) {
      // graphic control extension per frame (delay 10cs, no disposal,
      // no transparency) — what animation writers emit
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); u16(10); out.write(0); out.write(0)
      out.write(0x2c) // full-frame image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0)
      val idx = new Array[Int](w * h)
      var k = 0
      while (k < idx.length) {
        idx(k) = synthPixelByte(key, f.toLong * w * h + k) % 64; k += 1
      }
      writeGifImageData(out, idx, minCode)
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** SCENE-STRUCTURED animated synth payload for the keyframe-
    * detection query (`mm_keyframes` via the per-frame [[dhash64]]
    * lag): frame f belongs to scene sc = f/sceneLen, and its palette
    * index at pixel k is ([[phashPixelByte]](key2, k) + (key2 div 256)
    * ·(53k + 11)) mod 256 mod 64 with key2 = key·131 + sc — constant
    * WITHIN a scene, fresh content at every scene boundary.
    * The QUADRATIC generator is load-bearing here exactly as it is for
    * the dHash corpus: under the affine [[synthPixelByte]] a constant
    * key delta is a near-constant BYTE SHIFT of the whole image (the
    * mod-64/palette wraps scramble only a minority of cells), so
    * consecutive scenes could land within the keyframe threshold; the
    * key-dependent quadratic term decorrelates them per-pixel. The
    * (key2 div 256) mixing term widens the content alphabet from
    * phashPixelByte's intrinsic 256 key classes to 65536: without it a
    * video corpus's scene instances (3 per clip) pile ~30 deep per
    * content class by sf0.1 and the video-level near-dup's verified
    * pair volume goes QUADRATIC in that depth — 1.75M pairs, 6.9 s,
    * the slowest query on the board; with it, cross-video collisions
    * are rare and the pair volume is output-shaped (SCALE.md r12).
    * The scene's `jitterFrame`-th frame (f mod sceneLen == jitterFrame,
    * default 1) additionally jitters ONE pixel — the source pixel the
    * 9x8 dHash grid samples for cell (sc mod 8, sc mod 9) gets
    * (idx + 32) mod 64 — so the within-scene frames are NEAR-dups
    * (<= 2 gradient bits apart, a camera wobble), not byte-identical:
    * the keyframe rule must tolerate jitter without firing.
    *
    * `scenePerm` ROTATES the scene contents (the content key for the
    * scene shown at position q is (q + scenePerm) mod numScenes) — the
    * RE-EDITED VIDEO for the video-level near-dup query: same scenes,
    * different cut order, so whole-file digests and frame-aligned
    * compares both miss it while scene-agnostic keyframe matching does
    * not. All integer, replayed verbatim by the SQL oracles. */
  def synthGifScenes(key: Long, w: Int, h: Int, frames: Int,
      sceneLen: Int, scenePerm: Int = 0, jitterFrame: Int = 1): Array[Byte] = {
    require(frames >= 1 && sceneLen >= 1, "gif: bad scene shape")
    val numScenes = (frames + sceneLen - 1) / sceneLen
    val minCode = 6
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, w, h, minCode)
    def u16(v: Int): Unit = gifU16(out, v)
    var f = 0
    while (f < frames) {
      val sc = (f / sceneLen + scenePerm) % numScenes
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); u16(10); out.write(0); out.write(0)
      out.write(0x2c)
      u16(0); u16(0); u16(w); u16(h)
      out.write(0)
      val key2 = key * 131L + sc
      val idx = new Array[Int](w * h)
      var k = 0
      while (k < idx.length) {
        idx(k) = (java.lang.Math.floorMod(
          phashPixelByte(key2, k) + (key2 / 256L) * (53L * k + 11L),
          256L) % 64L).toInt
        k += 1
      }
      if (f % sceneLen == jitterFrame) {
        val p = ((sc % 8) * h / 8) * w + (sc % 9) * w / 9
        idx(p) = (idx(p) + 32) % 64
      }
      writeGifImageData(out, idx, minCode)
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** LZW-compress one image's index stream and write it as GIF image
    * data: min-code byte, <=255-byte sub-blocks, zero terminator.
    * Shared by the single-image and animated encoders.
    * REAL LZW: dictionary of index strings keyed by (prefixCode, next). */
  private def writeGifImageData(out: java.io.ByteArrayOutputStream,
      idx: Array[Int], minCode: Int): Unit = {
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    var width = minCode + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { bits.write((cur & 0xff).toInt); cur >>>= 8; nbits -= 8 }
    }
    emit(clear)
    var prefix = idx(0)
    var i = 1
    while (i < idx.length) {
      val key2 = prefix.toLong << 16 | idx(i)
      val hit = dict.get(key2)
      if (hit != null) prefix = hit.intValue()
      else {
        emit(prefix)
        dict.put(key2, Integer.valueOf(nextCode))
        nextCode += 1
        // width bump AFTER the add, one entry LATER than the naive
        // symmetric condition: the decoder's add-counter runs one
        // entry behind the encoder's at the same stream position (it
        // learns entry t only upon reading code t+1), so the decoder
        // bumps when ITS counter hits 2^width — which is when the
        // encoder's hits 2^width + 1. This is the conformant GIF
        // pairing (Appendix F; what giflib and the JDK implement) —
        // r11's ImageIO differential gate caught the earlier
        // one-code-early variant, which round-tripped against its own
        // decoder but silently desynced every conformant reader at
        // the first power-of-two boundary.
        if (nextCode == (1 << width) + 1 && width < 12) width += 1
        if (nextCode == 4096) { // table full: reset
          emit(clear)
          dict.clear()
          nextCode = eoi + 1
          width = minCode + 1
        }
        prefix = idx(i)
      }
      i += 1
    }
    emit(prefix)
    // Mirror the decoder's dictionary add for this FINAL data code: the
    // decoder, on reading it, adds one more entry (prev + first) that the
    // encoder never needed — and if that add lands exactly on the
    // decoder's bump boundary (its nextCode == 2^width, which equals
    // the encoder's nextCode here since the encoder skipped the add), the
    // decoder reads EOI at width+1 while an unmirrored encoder wrote it
    // at the old width. When the bitstream happened to be byte-aligned
    // the decoder then threw "ends before EOI" on a valid payload
    // (e.g. 2x31 at key%256==200 — pinned in MultimodalSpec). The
    // boundary value is unreachable with zero adds since the last clear
    // (nextCode resets to eoi+1 < 2^width), so no emitted-count guard
    // is needed: if the condition holds, the decoder's final add happens.
    if (nextCode == (1 << width) && width < 12) width += 1
    emit(eoi)
    if (nbits > 0) bits.write((cur & 0xff).toInt)
    // sub-block framing: <=255-byte chunks, zero terminator
    val z = bits.toByteArray
    var off = 0
    while (off < z.length) {
      val len = math.min(255, z.length - off)
      out.write(len)
      out.write(z, off, len)
      off += len
    }
    out.write(0)
  }

  case class GifImage(width: Int, height: Int,
      palette: Array[Byte] /* n x RGB */ ,
      indices: Array[Int] /* top-down row-major palette indices */ ,
      /* frame placement on the logical screen (r12): carried so a
       * partial-frame animation's offsets are not silently lost even
       * though compositing is out of contract (see decodeGifFrames) */
      left: Int = 0, top: Int = 0,
      /* graphic-control state (r12): disposal method (0 none /
       * 1 leave / 2 restore-to-background / 3 restore-to-previous)
       * and the transparent palette index (-1 = opaque frame) — the
       * inputs compositeGifFrames replays */
      disposal: Int = 0, transparentIndex: Int = -1) {
    /** Decoded RGB byte at logical position k (pixel k/3, channel k%3). */
    def rgb(k: Int): Int =
      palette(indices(k / 3) * 3 + k % 3) & 0xff
  }

  /** REAL GIF87a/89a decoder: validates the signature, reads the
    * logical screen descriptor and color table (global, or a local
    * table overriding it — r11, required by JDK-written GIFs), skips
    * extension blocks (sub-block framing), LZW-decodes the image data
    * — variable-width codes, clear/EOI handling, dictionary
    * reconstruction including the KwKwK case (code == nextCode: the
    * string is prev + prev.head) — and un-does four-pass interlacing
    * (r11: the JDK writer interlaces BY DEFAULT, so any pipeline
    * reading foreign GIFs meets it; pinned by ForeignEncoderSpec).
    * Malformed input — bad magic, code beyond the dictionary,
    * truncated sub-blocks, missing EOI — is a loud
    * IllegalArgumentException. */
  def decodeGif(payload: Array[Byte]): GifImage =
    // every structural error is an IAE, including reads running off a
    // truncated payload mid-field. First image only (trailing blocks
    // untouched) — the historical single-image contract.
    try decodeGifFrames0(payload, maxFrames = 1).frames.head
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("gif: truncated payload")
    }

  /** ALL image blocks of an animated GIF, in stream order — each
    * frame stands alone (per-frame local color table and interlacing
    * honored; graphic-control disposal/transparency compositing is
    * NOT attempted — the synth/JDK animation shape is full-frame
    * replacement, and partial-frame compositing would silently guess
    * at semantics this engine has no oracle for). The per-frame LZW
    * dictionary resets at each image block, as the spec requires. */
  def decodeGifFrames(payload: Array[Byte]): IndexedSeq[GifImage] =
    try decodeGifFrames0(payload, maxFrames = Int.MaxValue).frames
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("gif: truncated payload")
    }

  /** Parsed GIF container: logical screen, background index, global
    * color table (null when absent), and the raw frames in stream
    * order — everything [[compositeGifFrames]] needs. */
  private[graft] case class GifStream(screenW: Int, screenH: Int,
      bgIndex: Int, globalPalette: Array[Byte], frames: IndexedSeq[GifImage])

  /** COMPOSITED animation frames (r12, opt-in — [[decodeGifFrames]]
    * keeps the raw per-frame contract): each returned raster is the
    * full logical screen as a viewer would present it after frame f —
    * frames drawn at their (left, top) offsets, transparent-index
    * pixels leaving the canvas through, and the GCE disposal methods
    * replayed between frames (1/none = leave; 2 = restore the frame's
    * RECT to the background color; 3 = restore the canvas to its
    * pre-frame state). The backdrop starts as the logical-screen
    * background color (global palette at the header's bg index; black
    * when no global table) — the one deterministic choice available
    * without an alpha channel, documented rather than guessed per
    * viewer. Output is RGB ([[BmpImage]] rasters, bpp 24): composited
    * frames cannot stay palette-indexed because frames may carry
    * different local color tables. */
  def compositeGifFrames(payload: Array[Byte]): IndexedSeq[BmpImage] = {
    val s =
      try decodeGifFrames0(payload, maxFrames = Int.MaxValue)
      catch {
        case _: ArrayIndexOutOfBoundsException =>
          throw new IllegalArgumentException("gif: truncated payload")
      }
    val n = s.screenW * s.screenH * 3
    val canvas = new Array[Byte](n)
    if (s.globalPalette != null) {
      require(s.bgIndex * 3 + 2 < s.globalPalette.length,
        s"gif: background index ${s.bgIndex} beyond the global palette")
      var i = 0
      while (i < n) { canvas(i) = s.globalPalette(s.bgIndex * 3 + i % 3); i += 1 }
    }
    val out = IndexedSeq.newBuilder[BmpImage]
    s.frames.foreach { fr =>
      val before =
        if (fr.disposal == 3) java.util.Arrays.copyOf(canvas, n) else null
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width) {
          val ix = fr.indices(y * fr.width + x)
          if (ix != fr.transparentIndex) {
            val d = ((fr.top + y) * s.screenW + (fr.left + x)) * 3
            canvas(d) = fr.palette(ix * 3)
            canvas(d + 1) = fr.palette(ix * 3 + 1)
            canvas(d + 2) = fr.palette(ix * 3 + 2)
          }
          x += 1
        }
        y += 1
      }
      out += BmpImage(s.screenW, s.screenH, 24,
        java.util.Arrays.copyOf(canvas, n))
      fr.disposal match {
        case 2 => // restore the frame RECT to the background color
          var yy = 0
          while (yy < fr.height) {
            var xx = 0
            while (xx < fr.width) {
              val d = ((fr.top + yy) * s.screenW + (fr.left + xx)) * 3
              var c = 0
              while (c < 3) {
                canvas(d + c) =
                  if (s.globalPalette != null)
                    s.globalPalette(s.bgIndex * 3 + c)
                  else 0.toByte
                c += 1
              }
              xx += 1
            }
            yy += 1
          }
        case 3 => System.arraycopy(before, 0, canvas, 0, n)
        case _ => // 0/1: leave the canvas as presented
      }
    }
    out.result()
  }

  /** Synthetic COMPOSITED animation for the mm_gif_composite oracle: a
    * 4-frame GIF89a on a `sw`x`sh` logical screen exercising every
    * disposal method and transparency —
    *
    *   frame 0: full screen at (0,0), disposal 1 (leave), opaque;
    *   frame 1: 7x5 rect at (3,2), disposal 2 (restore rect to
    *            background), TRANSPARENT index 63;
    *   frame 2: 6x4 rect at (5,4), disposal 3 (restore to previous),
    *            opaque;
    *   frame 3: swx3 strip at (0,8), disposal 1, TRANSPARENT index 63.
    *
    * Frame f's pixel at GLOBAL screen cell (gy, gx) carries index
    * [[synthPixelByte]](key, f·sw·sh + gy·sw + gx) mod 64 — keyed by
    * global coordinates so the SQL oracle replays rect membership and
    * the composite rule without a local-coordinate transform.
    * Requires sw >= 10, sh >= 11 so the rects fit. */
  def synthGifComposited(key: Long, sw: Int, sh: Int): Array[Byte] = {
    require(sw >= 10 && sh >= 11, s"gif composite synth: screen ${sw}x$sh too small")
    val minCode = 6
    val rects = Array( // (left, top, w, h, disposal, transparent)
      (0, 0, sw, sh, 1, false),
      (3, 2, 7, 5, 2, true),
      (5, 4, 6, 4, 3, false),
      (0, 8, sw, 3, 1, true))
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, sw, sh, minCode)
    def u16(v: Int): Unit = gifU16(out, v)
    var f = 0
    while (f < rects.length) {
      val (left, top, w, h, disposal, transparent) = rects(f)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposal << 2) | (if (transparent) 1 else 0))
      u16(10)
      out.write(if (transparent) 63 else 0)
      out.write(0)
      out.write(0x2c)
      u16(left); u16(top); u16(w); u16(h)
      out.write(0)
      val idx = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          idx(y * w + x) = synthPixelByte(key,
            f.toLong * sw * sh + (top + y).toLong * sw + (left + x)) % 64
          x += 1
        }
        y += 1
      }
      writeGifImageData(out, idx, minCode)
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  private def decodeGifFrames0(payload: Array[Byte],
      maxFrames: Int): GifStream = {
    require(payload.length > 13, "gif: truncated header")
    val sig = new String(payload, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"gif: bad signature $sig")
    var p = 6
    def u16(): Int = {
      val v = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8); p += 2; v
    }
    val sw = u16(); val sh = u16()
    val packed = payload(p) & 0xff
    val bgIndex = payload(p + 1) & 0xff
    p += 3 // packed, bg, aspect
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) { // global color table (optional per spec)
      val gctSize = 2 << (packed & 7)
      require(p + gctSize * 3 <= payload.length, "gif: truncated color table")
      palette = java.util.Arrays.copyOfRange(payload, p, p + gctSize * 3)
      p += gctSize * 3
    }
    // graphic-control state scoping the next image block (r12)
    var pendingDisposal = 0
    var pendingTransparent = -1
    // decode the image block whose 0x2c byte was just consumed: the
    // descriptor (with optional local color table + interlace flag),
    // then the LZW-coded index stream — per-frame, dictionary reset
    def decodeOneImage(): GifImage = {
      val left = u16(); val top = u16()
      val w = u16(); val h = u16()
      // the frame must sit INSIDE the logical screen including its
      // offset (r12 — a frame with left+w > sw is malformed and fails
      // loudly like every other structural error)
      require(w > 0 && h > 0 && left + w <= sw && top + h <= sh,
        "gif: bad image size")
      val lp = payload(p) & 0xff; p += 1
      var framePal = palette
      if ((lp & 0x80) != 0) { // local color table overrides global
        val lctSize = 2 << (lp & 7)
        require(p + lctSize * 3 <= payload.length,
          "gif: truncated local color table")
        framePal = java.util.Arrays.copyOfRange(payload, p, p + lctSize * 3)
        p += lctSize * 3
      }
      val interlaced = (lp & 0x40) != 0
      require(framePal != null,
        "gif: no color table (neither global nor local)")
      val minCode = payload(p) & 0xff; p += 1
      require(minCode >= 2 && minCode <= 8, s"gif: bad LZW min code $minCode")
      // concatenate the sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var len = payload(p) & 0xff; p += 1
      while (len != 0) {
        require(p + len <= payload.length, "gif: truncated sub-block")
        data.write(payload, p, len); p += len
        len = payload(p) & 0xff; p += 1
      }
      val z = data.toByteArray
      // LZW decode
      val clear = 1 << minCode
      val eoi = clear + 1
      val out = new Array[Int](w * h)
      var outN = 0
      val prefixOf = new Array[Int](4096)
      val suffixOf = new Array[Int](4096)
      var nextCode = eoi + 1
      var width = minCode + 1
      var cur = 0L
      var nbits = 0
      var zp = 0
      var prev = -1
      var sawEoi = false
      val stack = new Array[Int](4096)
      def firstOf(code0: Int): Int = {
        var c = code0
        while (c >= clear) c = prefixOf(c)
        c
      }
      while (!sawEoi) {
        while (nbits < width && zp < z.length) {
          cur |= (z(zp) & 0xffL) << nbits; nbits += 8; zp += 1
        }
        require(nbits >= width, "gif: LZW stream ends before EOI")
        val code = (cur & ((1L << width) - 1)).toInt
        cur >>>= width; nbits -= width
        if (code == clear) {
          nextCode = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          sawEoi = true
        } else {
          require(code < nextCode || (code == nextCode && prev >= 0),
            s"gif: code $code beyond dictionary ($nextCode)")
          var sp = 0
          if (code == nextCode) { // KwKwK: prev + first(prev)
            stack(sp) = firstOf(prev); sp += 1
            var c = prev
            while (c >= clear) { stack(sp) = suffixOf(c); sp += 1; c = prefixOf(c) }
            stack(sp) = c; sp += 1
          } else {
            var c = code
            while (c >= clear) { stack(sp) = suffixOf(c); sp += 1; c = prefixOf(c) }
            stack(sp) = c; sp += 1
          }
          require(outN + sp <= out.length, "gif: more pixels than w*h")
          while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
          if (prev >= 0 && nextCode < 4096) {
            prefixOf(nextCode) = prev
            suffixOf(nextCode) = firstOf(code)
            nextCode += 1
            // the conformant decoder bump (Appendix F): grow when the
            // counter fills the current width — one entry behind the
            // encoder's 2^width + 1 condition at the same stream
            // position (see the encoder-side comment)
            if (nextCode == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      require(outN == w * h, s"gif: decoded $outN pixels, expected ${w * h}")
      out.foreach(ix => require(ix * 3 + 2 < framePal.length,
        s"gif: index $ix beyond palette"))
      // interlaced streams carry rows in four passes (0,8,16.. / 4,12..
      // / 2,6.. / 1,3,5..); reorder file rows back to top-down
      val pixels =
        if (!interlaced) out
        else {
          val deint = new Array[Int](w * h)
          var fileRow = 0
          for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
               y <- start until h by step) {
            System.arraycopy(out, fileRow * w, deint, y * w, w)
            fileRow += 1
          }
          deint
        }
      GifImage(w, h, framePal, pixels, left, top,
        pendingDisposal, pendingTransparent)
    }
    // walk the block stream: extensions skipped EXCEPT the graphic
    // control extension (label 0xF9), whose disposal/transparency
    // fields scope the next image block (r12 — compositing inputs);
    // every image block decoded (up to maxFrames), trailer ends the walk
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifImage]
    var done = false
    while (!done && frames.length < maxFrames) {
      require(p < payload.length,
        if (frames.isEmpty) "gif: no image descriptor"
        else "gif: missing trailer")
      val b = payload(p) & 0xff; p += 1
      b match {
        case 0x2c =>
          frames += decodeOneImage()
          pendingDisposal = 0; pendingTransparent = -1 // GCE scope ends
        case 0x21 => // extension: label + sub-blocks
          val label = payload(p) & 0xff; p += 1
          var first = true
          var len = payload(p) & 0xff; p += 1
          while (len != 0) {
            if (label == 0xf9 && first && len == 4) {
              val packed = payload(p) & 0xff
              pendingDisposal = (packed >> 2) & 7
              pendingTransparent =
                if ((packed & 1) != 0) payload(p + 3) & 0xff else -1
            }
            first = false
            p += len; len = payload(p) & 0xff; p += 1
          }
        case 0x3b =>
          require(frames.nonEmpty, "gif: trailer before image")
          done = true
        case x => throw new IllegalArgumentException(f"gif: unknown block 0x$x%02x")
      }
    }
    GifStream(sw, sh, bgIndex, palette, frames.toIndexedSeq)
  }

  case class PngImage(width: Int, height: Int, bitDepth: Int,
      colorType: Int, pixels: Array[Byte] /* top-down row-major RGB */)

  /** REAL PNG decoder (8-bit RGB, non-interlaced): validates the
    * signature, walks the chunk list verifying EVERY chunk's CRC-32,
    * concatenates all IDAT payloads in order, inflates the zlib
    * stream, and reconstructs scanlines by inverting the five RFC 2083
    * filters (None/Sub/Up/Average/Paeth, bpp = 3). Unknown ancillary
    * chunks are skipped, as the spec requires. Malformed input — bad
    * magic, CRC mismatch, short inflate, unsupported color — is a loud
    * IllegalArgumentException, never garbage pixels. */
  def decodePng(payload: Array[Byte]): PngImage =
    // same contract as decodeGif: any structural error, including a read
    // running off a truncated payload mid-field, is a loud IAE
    try decodePng0(payload)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("png: truncated payload")
    }

  private def decodePng0(payload: Array[Byte]): PngImage = {
    require(payload.length >= 8 + 25 + 12,
      "png: truncated file")
    var p = 0
    while (p < 8) {
      require(payload(p) == PngSig(p), "png: bad signature")
      p += 1
    }
    var w = 0
    var h = 0
    var bitDepth = -1
    var colorType = -1
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    def be32(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    while (!sawIend) {
      require(p + 8 <= payload.length, "png: truncated chunk header")
      val len = be32(p)
      // bound check in Long: a crafted len near Int.MaxValue overflows
      // `p + 12 + len` negative and would sail past an Int comparison
      // straight into an AIOOBE inside CRC32.update
      require(len >= 0 && p.toLong + 12L + len <= payload.length,
        s"png: truncated chunk (len=$len)")
      val typ = new String(payload, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(payload, p + 4, 4 + len)
      require(crc.getValue.toInt == be32(p + 8 + len),
        s"png: CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          require(!sawIhdr && len == 13, "png: bad IHDR")
          w = be32(p + 8); h = be32(p + 12)
          require(w > 0 && h > 0, "png: empty image")
          bitDepth = payload(p + 16) & 0xff
          colorType = payload(p + 17) & 0xff
          require(bitDepth == 8 && colorType == 2,
            s"png: only 8-bit RGB supported, got depth=$bitDepth color=$colorType")
          require((payload(p + 18) & 0xff) == 0 &&
            (payload(p + 19) & 0xff) == 0 && (payload(p + 20) & 0xff) == 0,
            "png: unsupported compression/filter/interlace method")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "png: IDAT before IHDR")
          idat.write(payload, p + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk: skip
      }
      p += 12 + len
    }
    require(sawIhdr, "png: missing IHDR")
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val bpr = w * 3
    val filtered = new Array[Byte](h * (bpr + 1))
    var got = 0
    try {
      while (got < filtered.length && !infl.finished()) {
        val n = infl.inflate(filtered, got, filtered.length - got)
        require(n > 0 || infl.finished(), "png: inflate stalled")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"png: bad zlib stream: ${e.getMessage}")
    } finally infl.end()
    require(got == filtered.length,
      s"png: short pixel stream ($got of ${filtered.length} bytes)")
    val out = new Array[Byte](h * bpr)
    var y = 0
    while (y < h) {
      val f = filtered(y * (bpr + 1)) & 0xff
      require(f <= 4, s"png: bad filter type $f")
      var i = 0
      while (i < bpr) {
        val x = filtered(y * (bpr + 1) + 1 + i) & 0xff
        val a = if (i >= 3) out(y * bpr + i - 3) & 0xff else 0
        val b = if (y > 0) out((y - 1) * bpr + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) out((y - 1) * bpr + i - 3) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }
        out(y * bpr + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    PngImage(w, h, bitDepth, colorType, out)
  }

  // ------------------------------------------------------------------
  // REAL baseline JPEG codec (round 10): the last real-codec rung pure
  // JVM reaches — entropy coding (canonical Huffman over DC categories
  // and AC run/size symbols, MSB-first bitstream with 0xFF00 byte
  // stuffing), DC prediction, zigzag, dequantization, and a full 2D
  // IDCT. Grayscale single-component baseline (SOF0), which is a 100%
  // conformant JPEG; the tables ride in DQT/DHT like any real file, so
  // the decoder's table parsing is exercised for real rather than
  // against hard-coded Annex K constants.
  //
  // Oracle discipline (the PNG/GIF formula-oracle pattern, adapted to
  // a LOSSY format): the graded payload is BLOCK-CONSTANT — every 8x8
  // block holds one value v = 128 + 2*m with m in [-32, 31], so its
  // DCT is DC-only (DC = 16*m), the DC quant step is exactly 16
  // (quantized DC = m, zero rounding loss), and the IDCT reconstructs
  // v bit-exactly. The roundtrip is therefore EXACT despite JPEG being
  // lossy in general, and the DuckDB oracle replays the pixel formula
  // directly. The general lossy path (AC coefficients, zigzag runs,
  // ZRL, mid-block EOB) is exercised in MultimodalSpec against an
  // independent reference IDCT.
  // ------------------------------------------------------------------

  /** Quantized-domain block value for the graded payload: block b of
    * doc `key` holds pixel value 128 + 2*jpegBlockM(key, b). Shared
    * with the SQL oracle ((synthPixelByte % 64) - 32). */
  def jpegBlockM(key: Long, b: Long): Int = synthPixelByte(key, b) % 64 - 32

  /** Quant table used by [[synthJpeg]]: DC step exactly 16 (the
    * exactness contract above); AC steps deterministic filler — the
    * graded payload has zero ACs, and the spec's AC cases read the
    * steps back out of DQT, so the values only need to be valid. */
  private[graft] val JpegQuant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 16 else 16 + i)

  /** Canonical Huffman tables carried in DHT. DC: the 12 categories,
    * all 4-bit codes (12 <= 16 codes, max assigned code 1011 — the
    * all-ones code stays unused as T.81 requires). AC: all 162
    * baseline symbols (EOB, ZRL, run 0-15 x size 1-10), all 8-bit
    * codes (162 <= 256, max code 10100001). Self-consistent by
    * construction: the encoder uses the same (bits, values) lists the
    * decoder rebuilds from DHT. */
  private val JpegDcVals: Array[Int] = (0 to 11).toArray
  private val JpegAcVals: Array[Int] =
    Array(0x00, 0xF0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)

  /** A valid baseline JFIF (grayscale, SOF0): w x h pixels where
    * pixel(x, y) = 128 + 2*[[jpegBlockM]](key, blockIndex) and
    * blockIndex = (y/8)*ceil(w/8) + (x/8) — block-constant, so the
    * lossy roundtrip is exact (scaladoc above). Edge blocks of
    * non-multiple-of-8 images replicate into the pad region (still
    * constant), so crop dimensions stay exact too. */
  def synthJpeg(key: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg: bad dims")
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val blocks = Array.tabulate(bw * bh) { b =>
      val coeffs = new Array[Int](64)
      coeffs(0) = jpegBlockM(key, b)
      coeffs
    }
    encodeJpegBlocks(blocks, w, h)
  }

  /** Wide-alphabet block value for the LOSSY-boundary perceptual-dedup
    * corpus (mm_phash_lossy_dups). NOT [[jpegBlockM]]: that one is
    * AFFINE in (key, b) mod 64 — key contributes only the additive
    * offset key·31·97, so over all keys an image takes at most 64
    * distinct shapes per block layout and unrelated keys collide
    * within a perceptual-hash match radius (the [[phashPixelByte]]
    * lesson, here in the quantized DC domain).
    *
    * The mix runs MOD THE PRIME 251, folded to the 64-level DC
    * alphabet only at the end. A power-of-2 modulus here is a trap the
    * first draft of this rule hit: on a 32-wide block grid b = 32·gy +
    * gx, b² ≡ gx² (mod 64) — the 1024·gy² and 64·gy·gx terms VANISH —
    * so the quadratic "mixing" left the block matrix near-periodic in
    * gy, the DCT spectrum degenerate (many exactly-zero coefficients
    * tying at the median), and measured corpora showed hamming-0
    * collisions between unrelated keys plus 25-bit flips from
    * one-pixel perturbations. Mod 251 a quadratic has no power-of-2
    * degeneracy; keys fall into distinct content classes until
    * key ≡ key' (mod 251) AND key/251 ≡ key'/251 (mod 251) — a 63001-
    * key period, past sf1eq-scale corpora (the mm_video_dups
    * output-quadratic lesson). Blocks b and b + 251 intentionally
    * share a value (b enters mod 251): a fixed repetition pattern
    * common to every key, which costs entropy only beyond 251·6 bits
    * per image. All terms are nonnegative for nonnegative (key, b), so
    * DuckDB `%` replays floorMod verbatim. */
  def jpegBlockMWide(key: Long, b: Long): Int =
    (java.lang.Math.floorMod(
      (key * 31L + b) * 97L + (key * 7L + 13L) * b * b
        + (key / 251L) * (59L * b + 17L), 251L) % 64L).toInt - 32

  /** [[synthJpeg]] with the wide-alphabet block rule: a valid baseline
    * grayscale JFIF where pixel(x, y) = 128 + 2·[[jpegBlockMWide]](key,
    * (y/8)·ceil(w/8) + x/8). Block-constant DC-only payload, so the
    * lossy roundtrip is bit-exact (DC quant step 16 — the synthJpeg
    * exactness contract) and a SQL oracle replays the decoded pixels
    * from the block formula alone. */
  def synthJpegWide(key: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg: bad dims")
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val blocks = Array.tabulate(bw * bh) { b =>
      val coeffs = new Array[Int](64)
      coeffs(0) = jpegBlockMWide(key, b)
      coeffs
    }
    encodeJpegBlocks(blocks, w, h)
  }

  /** The pixels [[synthJpegWide]] decodes to, as a 3-channel grayscale
    * array (all channels equal, so luma == the formula value) — the
    * LOSSLESS twin's source in the cross-codec perceptual-dedup
    * corpus: one parity round-trips synthJpegWide through the REAL
    * JPEG decoder, the other encodes THESE pixels through the REAL
    * PNG codec, and an intact perceptual hash must pair them.
    * `perturbCell` is a (gy, gx) cell of [[phashDct64]]'s 32x32
    * sampled grid; the SOURCE pixel that cell samples under
    * [[resizeNearest]]'s rule (sy = gy·h/32, sx = gx·w/32) gets
    * +`perturbDelta` — no mod-256 wrap as long as delta <= 65
    * (values are 128 + 2m <= 190), which keeps the oracle's replay a
    * plain addition. For w, h >= 32 the resize map is injective, so
    * the perturbation lands in exactly one grid cell. */
  def jpegWidePixels(key: Long, w: Int, h: Int,
      perturbCell: Option[(Int, Int)] = None,
      perturbDelta: Int = 24): Array[Byte] = {
    require(perturbDelta >= 0 && perturbDelta <= 65, "delta would wrap")
    val bw = (w + 7) / 8
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val b = (i / w / 8) * bw + (i % w) / 8
      val v = (128 + 2 * jpegBlockMWide(key, b.toLong)).toByte
      px(3 * i) = v; px(3 * i + 1) = v; px(3 * i + 2) = v
      i += 1
    }
    perturbCell.foreach { case (gy, gx) =>
      val p = (gy.toLong * h / 32).toInt * w + (gx.toLong * w / 32).toInt
      val v = ((px(3 * p) & 0xff) + perturbDelta).toByte
      px(3 * p) = v; px(3 * p + 1) = v; px(3 * p + 2) = v
    }
    px
  }

  /** Grayscale decode output (one int per pixel) as the 3-equal-channel
    * byte layout the perceptual hashes consume. */
  def grayToRgb(pixels: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](pixels.length * 3)
    var i = 0
    while (i < pixels.length) {
      val v = pixels(i).toByte
      out(3 * i) = v; out(3 * i + 1) = v; out(3 * i + 2) = v
      i += 1
    }
    out
  }

  /** The entropy-coded-segment writer shared by the grayscale and
    * color encoders: MSB-first bitstream with 0xFF00 byte stuffing,
    * canonical-code Huffman block encoding (DC prediction handled by
    * the caller passing/receiving prevDc), 1-padded flush. */
  private final class JpegScanWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nb = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nb += len
      while (nb >= 8) {
        val b = ((acc >> (nb - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00)
        nb -= 8
      }
    }
    private def category(v: Int): Int = { // bit length of |v| (0 for 0)
      var s = 0
      var a = math.abs(v)
      while (a != 0) { s += 1; a >>= 1 }
      s
    }
    private def putCoeff(v: Int, s: Int): Unit =
      if (s > 0) putBits(if (v >= 0) v else v + (1 << s) - 1, s)
    /** Encode one quantized block (natural order, DC at index 0);
      * returns the block's DC for the caller's next prediction. */
    def encodeBlock(coeffs: Array[Int], prevDc: Int,
        dcCode: Map[Int, Int], acCode: Map[Int, Int]): Int = {
      val diff = coeffs(0) - prevDc
      val s = category(diff)
      putBits(dcCode(s), 4)
      putCoeff(diff, s)
      // AC run-length over zigzag order
      var lastNz = 0
      var zi = 1
      while (zi < 64) { if (coeffs(JpegZigzag(zi)) != 0) lastNz = zi; zi += 1 }
      var run = 0
      zi = 1
      while (zi <= lastNz) {
        val v = coeffs(JpegZigzag(zi))
        if (v == 0) run += 1
        else {
          while (run >= 16) { putBits(acCode(0xF0), 8); run -= 16 } // ZRL
          val sz = category(v)
          require(sz <= 10, "jpeg: AC coefficient out of table range")
          putBits(acCode((run << 4) | sz), 8)
          putCoeff(v, sz)
          run = 0
        }
        zi += 1
      }
      if (lastNz < 63) putBits(acCode(0x00), 8) // EOB
      coeffs(0)
    }
    def finish(): Unit =
      if (nb > 0) putBits((1 << (8 - nb)) - 1, 8 - nb) // pad with 1s
  }

  // canonical codes: value at index i of an all-L-bit table has code i
  private lazy val JpegDcCode: Map[Int, Int] = JpegDcVals.zipWithIndex.toMap
  private lazy val JpegAcCode: Map[Int, Int] = JpegAcVals.zipWithIndex.toMap

  /** Serialize quantized coefficient blocks (natural order, DC at 0) as
    * a baseline grayscale JPEG. Split out of [[synthJpeg]] so the spec
    * can feed hand-made AC coefficient sets (runs, ZRL, mid-block EOB)
    * through the REAL entropy encoder. */
  private[graft] def encodeJpegBlocks(blocks: Array[Array[Int]],
      w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 1 + 64) // DQT: table 0, 8-bit precision
    u8(0x00)
    JpegZigzag.foreach(i => u8(JpegQuant(i))) // stored in zigzag order
    marker(0xc0); u16(2 + 6 + 3) // SOF0: 8-bit, 1 component
    u8(8); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, quant table 0
    def writeDht(cls: Int, vals: Array[Int], codeLen: Int): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8(cls << 4) // class (0 DC / 1 AC), table id 0
      (1 to 16).foreach(l => u8(if (l == codeLen) vals.length else 0))
      vals.foreach(u8)
    }
    writeDht(0, JpegDcVals, 4)
    writeDht(1, JpegAcVals, 8)
    marker(0xda); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00) // component 1: DC table 0, AC table 0
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    val sw = new JpegScanWriter(out)
    var prevDc = 0
    blocks.foreach(c => prevDc = sw.encodeBlock(c, prevDc, JpegDcCode, JpegAcCode))
    sw.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Chroma quant table for [[synthJpegColor]]: DC step exactly 16
    * (the same exactness contract as luma), AC filler distinct from
    * [[JpegQuant]]'s so a decoder that mixes up the two DQT tables
    * fails the spec's AC cases. */
  private[graft] val JpegQuantChroma: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 16 else 17 + i)

  /** Quantized-domain chroma DC for the graded color payload: MCU `mi`
    * of doc `key` holds Cb = 128 + 2*jpegChromaM(key, 100000, mi) and
    * Cr = 128 + 2*jpegChromaM(key, 200000, mi) — disjoint
    * [[synthPixelByte]] stream offsets so Y/Cb/Cr are uncorrelated.
    * Shared with the SQL oracle ((synthPixelByte % 64) - 32). */
  def jpegChromaM(key: Long, stream: Long, mi: Long): Int =
    synthPixelByte(key, stream + mi) % 64 - 32

  /** A valid baseline YCbCr JFIF: 4:2:0 (Y 2x2, chroma 1x1 — the
    * near-universal subsampling, interleaved 4-Y-blocks-then-Cb-then-Cr
    * MCUs) by default, 4:4:4 with `chroma420 = false`. The graded
    * payload is block-constant in every component — Y block (bx, by)
    * of the UNPADDED ceil(w/8) x ceil(h/8) grid holds
    * 128 + 2*[[jpegBlockM]](key, by*bw + bx) (MCU-pad blocks replicate
    * the clamped edge block and are cropped away), and Cb/Cr are
    * constant per MCU via [[jpegChromaM]] — so the lossy roundtrip is
    * bit-exact in YCbCr (the [[synthJpeg]] argument per component) and
    * the RGB conversion is the decoder's deterministic fixed-point
    * transform, replayable in SQL. */
  def synthJpegColor(key: Long, w: Int, h: Int,
      chroma420: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg: bad dims")
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    def dcOnly(m: Int): Array[Int] = {
      val c = new Array[Int](64)
      c(0) = m
      c
    }
    if (chroma420) {
      val mbw = (w + 15) / 16
      val mbh = (h + 15) / 16
      // Y rides the MCU grid (2*mbw x 2*mbh blocks); pad blocks beyond
      // the real bw x bh grid replicate the clamped edge block so crop
      // dimensions stay exact
      val yB = Array.tabulate(2 * mbh, 2 * mbw) { (gby, gbx) =>
        dcOnly(jpegBlockM(key,
          math.min(gby, bh - 1).toLong * bw + math.min(gbx, bw - 1)))
      }
      val cbB = Array.tabulate(mbh, mbw)((mr, mc) =>
        dcOnly(jpegChromaM(key, 100000L, mr.toLong * mbw + mc)))
      val crB = Array.tabulate(mbh, mbw)((mr, mc) =>
        dcOnly(jpegChromaM(key, 200000L, mr.toLong * mbw + mc)))
      encodeJpegColor(yB, cbB, crB, w, h, chroma420 = true)
    } else {
      val yB = Array.tabulate(bh, bw)((by, bx) =>
        dcOnly(jpegBlockM(key, by.toLong * bw + bx)))
      val cbB = Array.tabulate(bh, bw)((by, bx) =>
        dcOnly(jpegChromaM(key, 100000L, by.toLong * bw + bx)))
      val crB = Array.tabulate(bh, bw)((by, bx) =>
        dcOnly(jpegChromaM(key, 200000L, by.toLong * bw + bx)))
      encodeJpegColor(yB, cbB, crB, w, h, chroma420 = false)
    }
  }

  /** Serialize per-component quantized blocks (row-major grids; Y on
    * the MCU grid when `chroma420`) as a baseline YCbCr JPEG: two DQT
    * tables in one segment, SOF0 with three components (Y 2x2 or 1x1,
    * chroma 1x1), four DHT tables (chroma selects id 1 — identical
    * content, distinct id, so component table SELECTION is exercised,
    * not just table parsing), one interleaved scan with per-component
    * DC prediction. Split out so the spec can feed AC coefficients
    * through any component. */
  private[graft] def encodeJpegColor(yBlocks: Array[Array[Array[Int]]],
      cbBlocks: Array[Array[Array[Int]]], crBlocks: Array[Array[Array[Int]]],
      w: Int, h: Int, chroma420: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 2 * (1 + 64)) // DQT: tables 0 + 1, one segment
    u8(0x00); JpegZigzag.foreach(i => u8(JpegQuant(i)))
    u8(0x01); JpegZigzag.foreach(i => u8(JpegQuantChroma(i)))
    marker(0xc0); u16(2 + 6 + 3 * 3) // SOF0: 8-bit, 3 components
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(if (chroma420) 0x22 else 0x11); u8(0) // Y
    u8(2); u8(0x11); u8(1) // Cb
    u8(3); u8(0x11); u8(1) // Cr
    def writeDht(cls: Int, id: Int, vals: Array[Int], codeLen: Int): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((cls << 4) | id)
      (1 to 16).foreach(l => u8(if (l == codeLen) vals.length else 0))
      vals.foreach(u8)
    }
    writeDht(0, 0, JpegDcVals, 4); writeDht(1, 0, JpegAcVals, 8)
    writeDht(0, 1, JpegDcVals, 4); writeDht(1, 1, JpegAcVals, 8)
    marker(0xda); u16(2 + 1 + 2 * 3 + 3) // SOS
    u8(3)
    u8(1); u8(0x00) // Y: DC table 0, AC table 0
    u8(2); u8(0x11) // Cb: DC table 1, AC table 1
    u8(3); u8(0x11) // Cr: DC table 1, AC table 1
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    val sw = new JpegScanWriter(out)
    val mbh = cbBlocks.length
    val mbw = cbBlocks(0).length
    var dcY = 0
    var dcCb = 0
    var dcCr = 0
    var mr = 0
    while (mr < mbh) {
      var mc = 0
      while (mc < mbw) {
        if (chroma420) {
          var v = 0
          while (v < 2) {
            var hh = 0
            while (hh < 2) {
              dcY = sw.encodeBlock(yBlocks(mr * 2 + v)(mc * 2 + hh), dcY,
                JpegDcCode, JpegAcCode)
              hh += 1
            }
            v += 1
          }
        } else {
          dcY = sw.encodeBlock(yBlocks(mr)(mc), dcY, JpegDcCode, JpegAcCode)
        }
        dcCb = sw.encodeBlock(cbBlocks(mr)(mc), dcCb, JpegDcCode, JpegAcCode)
        dcCr = sw.encodeBlock(crBlocks(mr)(mc), dcCr, JpegDcCode, JpegAcCode)
        mc += 1
      }
      mr += 1
    }
    sw.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Zigzag scan order: JpegZigzag(i) = natural (row-major) index of
    * the i-th zigzag position (T.81 Figure 5 traversal, generated —
    * not transcribed — by walking the anti-diagonals). */
  private[graft] val JpegZigzag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 to 14) {
      // anti-diagonal s: cells (r, s-r); even diagonals run bottom-up
      val cells = (math.max(0, s - 7) to math.min(7, s)).map(r => (r, s - r))
      val ordered = if (s % 2 == 0) cells.reverse else cells
      ordered.foreach { case (r, c) => out(i) = r * 8 + c; i += 1 }
    }
    out
  }

  case class JpegImage(width: Int, height: Int,
      pixels: Array[Int] /* top-down row-major gray values 0-255 */)

  /** REAL baseline JPEG decoder (grayscale SOF0, one scan, no restart
    * markers): walks the marker stream, parses DQT (8-bit precision)
    * and DHT (canonical Huffman reconstruction from the 16 length
    * counts — any conformant table, not just [[synthJpeg]]'s), SOF0
    * dims, then entropy-decodes the scan (DC prediction, AC run/size
    * with ZRL and EOB, 0xFF00 byte unstuffing), dequantizes through
    * the zigzag, applies a full 2D IDCT with level shift + clamp, and
    * crops the MCU grid to the declared dimensions. Malformed input is
    * a loud IllegalArgumentException. */
  def decodeJpeg(payload: Array[Byte]): JpegImage = {
    val d = decodeJpegPlanes(payload)
    require(d.planes.length == 1, "jpeg: expected grayscale (1 component)")
    val pl = d.planes(0)
    val pixels = new Array[Int](d.width * d.height)
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        pixels(y * d.width + x) = pl.samples(y * pl.stride + x)
        x += 1
      }
      y += 1
    }
    JpegImage(d.width, d.height, pixels)
  }

  case class JpegColorImage(width: Int, height: Int,
      rgb: Array[Int] /* top-down row-major, 3 ints (R, G, B) per pixel */)

  /** Bias added before the >>16 in the fixed-point YCbCr -> RGB
    * transform so the dividend stays non-negative: truncating and
    * floor division then agree, which is what lets the SQL oracle
    * replay the transform with `//` (DuckDB `//` truncates toward
    * zero on negatives; Scala >> floors — biased, they coincide). */
  private[graft] val JpegRgbBias: Int = 512 << 16

  /** REAL baseline YCbCr JPEG decoder: the [[decodeJpeg]] machinery
    * generalized to three components with 4:2:0 or 4:4:4 sampling —
    * interleaved-MCU entropy decode with per-component DC prediction
    * and quant/Huffman table selection, per-component planes on the
    * padded MCU grid, box (nearest) chroma upsample, then the
    * fixed-point JFIF conversion (2^16 scale, round half up, clamp):
    * R = (65536*Y + 91881*(Cr-128) + 32768 + bias >> 16) - 512, etc. —
    * integer-exact and replayed verbatim by the SQL oracle. */
  def decodeJpegColor(payload: Array[Byte]): JpegColorImage = {
    val d = decodeJpegPlanes(payload)
    require(d.planes.length == 3, "jpeg: expected YCbCr (3 components)")
    val py = d.planes(0)
    val pcb = d.planes(1)
    val pcr = d.planes(2)
    val rgb = new Array[Int](d.width * d.height * 3)
    def samp(p: JpegPlane, x: Int, y: Int): Int =
      p.samples((y * p.v / d.vMax) * p.stride + (x * p.h / d.hMax))
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val yv = samp(py, x, y)
        val cb = samp(pcb, x, y) - 128
        val cr = samp(pcr, x, y) - 128
        val base = 65536 * yv + 32768 + JpegRgbBias
        def clamp(t: Int): Int = math.max(0, math.min(255, (t >> 16) - 512))
        val o = (y * d.width + x) * 3
        rgb(o) = clamp(base + 91881 * cr)
        rgb(o + 1) = clamp(base - 22554 * cb - 46802 * cr)
        rgb(o + 2) = clamp(base + 116130 * cb)
        x += 1
      }
      y += 1
    }
    JpegColorImage(d.width, d.height, rgb)
  }

  /** One decoded component: sampling factors, padded-MCU-grid plane
    * and its row stride. */
  private[graft] case class JpegPlane(h: Int, v: Int, stride: Int,
      samples: Array[Int])
  private[graft] case class JpegDecoded(width: Int, height: Int,
      hMax: Int, vMax: Int, planes: Array[JpegPlane])

  private lazy val JpegCosT: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0) *
        (if (u == 0) math.sqrt(0.5) else 1.0)
  }

  /** Shared baseline decode core: marker walk, table parsing, the
    * interleaved scan (a single-component scan is the degenerate
    * one-block MCU), per-block dequant + IDCT into per-component
    * planes. Wrapped so any out-of-bounds read on truncated input
    * surfaces as the documented IllegalArgumentException. */
  private def decodeJpegPlanes(payload: Array[Byte]): JpegDecoded =
    try decodeJpegPlanes0(payload)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("jpeg: truncated payload")
    }

  private def decodeJpegPlanes0(payload: Array[Byte]): JpegDecoded = {
    require(payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "jpeg: bad SOI")
    var p = 2
    def u8(): Int = { val v = payload(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff); p += 2; v }
    var w = -1
    var h = -1
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    // Huffman tables keyed (class, id): value lists + canonical first
    // code / first index per length — the T.81 DECODE procedure
    case class Huff(minCode: Array[Int], maxCode: Array[Int],
        valPtr: Array[Int], vals: Array[Int])
    val huff = scala.collection.mutable.Map.empty[(Int, Int), Huff]
    def buildHuff(counts: Array[Int], vals: Array[Int]): Huff = {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
      Huff(minCode, maxCode, valPtr, vals)
    }
    var dcSel: Array[Int] = null
    var acSel: Array[Int] = null
    var sawSos = false
    while (!sawSos) {
      require((u8()) == 0xff, "jpeg: expected marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xdb => // DQT: one or more tables
          val end = p + u16() - 2
          while (p < end) {
            val pq = u8()
            require((pq >> 4) == 0, "jpeg: only 8-bit quant tables")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(JpegZigzag(i)) = u8(); i += 1 }
            quant(pq & 0x0f) = t
          }
        case 0xc0 => // SOF0 baseline: 1 (grayscale) or 3 (YCbCr) comps
          u16()
          require(u8() == 8, "jpeg: only 8-bit precision")
          h = u16(); w = u16()
          val nc = u8()
          require(nc == 1 || nc == 3, "jpeg: 1 or 3 components expected")
          compId = new Array[Int](nc)
          compH = new Array[Int](nc)
          compV = new Array[Int](nc)
          compTq = new Array[Int](nc)
          var i = 0
          while (i < nc) {
            compId(i) = u8()
            val hv = u8()
            compH(i) = hv >> 4
            compV(i) = hv & 0x0f
            require(compH(i) >= 1 && compH(i) <= 2 &&
              compV(i) >= 1 && compV(i) <= 2,
              "jpeg: sampling factors beyond 2 unsupported")
            compTq(i) = u8()
            i += 1
          }
          if (nc == 1)
            require(compH(0) == 1 && compV(0) == 1,
              "jpeg: grayscale subsampling unsupported")
        case 0xc4 => // DHT: one or more tables
          val end = p + u16() - 2
          while (p < end) {
            val tc = u8()
            val counts = Array.tabulate(16)(_ => u8())
            val n = counts.sum
            val vals = Array.tabulate(n)(_ => u8())
            huff((tc >> 4, tc & 0x0f)) = buildHuff(counts, vals)
          }
        case 0xda => // SOS: one interleaved scan covering every comp
          u16()
          val ns = u8()
          require(compId != null && ns == compId.length,
            "jpeg: scan must cover all frame components")
          dcSel = new Array[Int](ns)
          acSel = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            require(u8() == compId(i),
              "jpeg: scan component order must match the frame")
            val tt = u8()
            dcSel(i) = tt >> 4
            acSel(i) = tt & 0x0f
            i += 1
          }
          require(u8() == 0 && u8() == 63 && u8() == 0,
            "jpeg: progressive scans unsupported")
          sawSos = true
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"jpeg: non-baseline SOF marker 0x$m%02x")
        case 0xdd | 0xd0 | 0xd1 | 0xd2 | 0xd3 | 0xd4 | 0xd5 | 0xd6 |
             0xd7 => // DRI / RST0-7: restart intervals are not decoded,
          // and RSTn carries NO length word — falling into the
          // length-skipping default would misread two scan bytes as a
          // segment length. Fail loud and specific instead.
          throw new IllegalArgumentException(
            f"jpeg: restart markers unsupported (0x$m%02x)")
        case 0x01 | 0xd9 => // TEM / EOI: length-less markers that are
          // never valid before SOS in a decodable baseline stream
          throw new IllegalArgumentException(
            f"jpeg: unexpected length-less marker 0x$m%02x before SOS")
        case _ => // APPn / COM / anything skippable with a length
          val len = u16()
          require(len >= 2 && p.toLong + len - 2 <= payload.length,
            "jpeg: truncated segment")
          p += len - 2
      }
    }
    require(w > 0 && h > 0, "jpeg: missing SOF0 before SOS")
    val nc = compId.length
    val qs = Array.tabulate(nc)(i => quant.getOrElse(compTq(i),
      throw new IllegalArgumentException("jpeg: missing quant table")))
    val dcTabs = Array.tabulate(nc)(i => huff.getOrElse((0, dcSel(i)),
      throw new IllegalArgumentException("jpeg: missing DC table")))
    val acTabs = Array.tabulate(nc)(i => huff.getOrElse((1, acSel(i)),
      throw new IllegalArgumentException("jpeg: missing AC table")))
    // entropy reader: MSB-first, 0xFF00 unstuffing; any other 0xFF
    // marker inside the scan (EOI included) means the stream ended
    var acc = 0L
    var nb = 0
    def fill(): Unit = {
      val b = payload(p) & 0xff
      if (b == 0xff) {
        require(p + 1 < payload.length && (payload(p + 1) & 0xff) == 0x00,
          "jpeg: scan data exhausted before all blocks decoded")
        p += 2
      } else p += 1
      acc = (acc << 8) | b
      nb += 8
    }
    def getBits(n: Int): Int = {
      while (nb < n) fill()
      val v = ((acc >> (nb - n)) & ((1L << n) - 1)).toInt
      nb -= n
      v
    }
    def decodeSym(t: Huff): Int = {
      var code = getBits(1)
      var l = 1
      while (t.maxCode(l) < 0 || code > t.maxCode(l)) {
        require(l < 16, "jpeg: corrupt Huffman code")
        code = (code << 1) | getBits(1)
        l += 1
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val hMax = compH.max
    val vMax = compV.max
    val mcuCols = (w + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (h + 8 * vMax - 1) / (8 * vMax)
    val planes = Array.tabulate(nc) { i =>
      val stride = mcuCols * 8 * compH(i)
      JpegPlane(compH(i), compV(i), stride,
        new Array[Int](stride * mcuRows * 8 * compV(i)))
    }
    val coeffs = new Array[Int](64)
    // 2D IDCT, separable: rows then columns, double precision, round
    // half up + clamp (deterministic: IEEE doubles, fixed cos table);
    // writes the full 8x8 into the padded plane — the crop to declared
    // dimensions happens in the wrappers
    def idctInto(dst: Array[Int], stride: Int, px0: Int, py0: Int): Unit = {
      val tmp = new Array[Double](64)
      var y0 = 0
      while (y0 < 8) {
        var x0 = 0
        while (x0 < 8) {
          var acc0 = 0.0
          var u = 0
          while (u < 8) { acc0 += JpegCosT(x0)(u) * coeffs(y0 * 8 + u); u += 1 }
          tmp(y0 * 8 + x0) = acc0 / 2.0
          x0 += 1
        }
        y0 += 1
      }
      var x1 = 0
      while (x1 < 8) {
        var y1 = 0
        while (y1 < 8) {
          var acc1 = 0.0
          var v = 0
          while (v < 8) { acc1 += JpegCosT(y1)(v) * tmp(v * 8 + x1); v += 1 }
          val pix = math.floor(acc1 / 2.0 + 128.0 + 0.5).toInt
          dst((py0 + y1) * stride + px0 + x1) = math.max(0, math.min(255, pix))
          y1 += 1
        }
        x1 += 1
      }
    }
    val prevDc = new Array[Int](nc)
    var mr = 0
    while (mr < mcuRows) {
      var mc = 0
      while (mc < mcuCols) {
        var i = 0
        while (i < nc) {
          val q = qs(i)
          var bv = 0
          while (bv < compV(i)) {
            var bhh = 0
            while (bhh < compH(i)) {
              java.util.Arrays.fill(coeffs, 0)
              val s = decodeSym(dcTabs(i))
              require(s <= 11, "jpeg: bad DC category")
              prevDc(i) += extend(getBits(s), s)
              coeffs(0) = prevDc(i) * q(0)
              var zi = 1
              while (zi < 64) {
                val rs = decodeSym(acTabs(i))
                if (rs == 0x00) zi = 64 // EOB
                else if (rs == 0xF0) zi += 16 // ZRL
                else {
                  zi += rs >> 4
                  require(zi < 64, "jpeg: AC run past block end")
                  val sz = rs & 0x0f
                  val nat = JpegZigzag(zi)
                  coeffs(nat) = extend(getBits(sz), sz) * q(nat)
                  zi += 1
                }
              }
              idctInto(planes(i).samples, planes(i).stride,
                (mc * compH(i) + bhh) * 8, (mr * compV(i) + bv) * 8)
              bhh += 1
            }
            bv += 1
          }
          i += 1
        }
        mc += 1
      }
      mr += 1
    }
    JpegDecoded(w, h, hMax, vMax, planes)
  }
}
