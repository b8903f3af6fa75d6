package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in typed `mapPartitions`
  * batches (the Scala twin of `mapInPandas` — one JVM pass per
  * partition, no per-row UDF dispatch).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * environment): `decodeStub` derives deterministic fake dimensions
  * from the payload, clearly marked. Everything around it — schema,
  * partitioning, batch iteration, byte-level feature extraction, frame
  * sampling — is real and tested. At 100 TB the payload column stays
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
    * fake dimensions derived from payload size (??? in a real deploy:
    * swap for the actual decoder; the pipeline shape is unchanged). */
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
}
