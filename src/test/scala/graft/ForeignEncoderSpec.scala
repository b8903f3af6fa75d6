package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import java.awt.image.BufferedImage

/** The REVERSE differential gate: the JDK ENCODES, our decoders read.
  * ImageIoDifferentialSpec proves conformant readers accept our
  * synth payloads; this spec proves our decoders accept payloads we
  * did NOT produce — the JDK's PNG writer picks its own per-row
  * filters and zlib strategy, its GIF writer runs its own LZW
  * (different clear-code cadence, its own sub-block framing), its
  * BMP writer its own header variant, its JPEG writer real AC
  * coefficients through standard quant/Huffman tables (our synth
  * payloads are DC-only, so this is the only gate that pushes real
  * AC/ZRL/EOB streams from an independent encoder through the
  * entropy decoder). A data pipeline decodes files it didn't write;
  * round-tripping our own bytes can never prove that.
  */
class ForeignEncoderSpec extends AnyFunSuite {

  private val shapes = Seq((13, 7), (16, 16), (37, 22), (1, 1), (8, 31))
  private val keys = Seq(1L, 42L, 9999L)

  private def rgbImage(key: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * w + x) * 3
      val r = Multimodal.synthPixelByte(key, k)
      val g = Multimodal.synthPixelByte(key, k + 1)
      val b = Multimodal.synthPixelByte(key, k + 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("png: JDK-encoded files (foreign filter choices) decode bit-exactly") {
    for (key <- keys; (w, h) <- shapes) {
      val ours = Multimodal.decodePng(encode(rgbImage(key, w, h), "png"))
      assert(ours.width == w && ours.height == h, s"dims $key ${w}x$h")
      for (k <- 0 until w * h * 3)
        assert((ours.pixels(k) & 0xff) == Multimodal.synthPixelByte(key, k),
          s"png $key ${w}x$h byte $k")
    }
  }

  test("bmp: JDK-encoded files decode bit-exactly") {
    for (key <- keys; (w, h) <- shapes) {
      val ours = Multimodal.decodeBmp(encode(rgbImage(key, w, h), "bmp"))
      assert(ours.width == w && ours.height == h, s"dims $key ${w}x$h")
      // our pixels array is in BMP file channel order (B, G, R)
      for (p <- 0 until w * h) {
        assert((ours.pixels(3 * p) & 0xff) ==
          Multimodal.synthPixelByte(key, 3 * p + 2), s"bmp $key B px $p")
        assert((ours.pixels(3 * p + 1) & 0xff) ==
          Multimodal.synthPixelByte(key, 3 * p + 1), s"bmp $key G px $p")
        assert((ours.pixels(3 * p + 2) & 0xff) ==
          Multimodal.synthPixelByte(key, 3 * p), s"bmp $key R px $p")
      }
    }
  }

  test("gif: JDK-encoded files (foreign LZW stream) decode bit-exactly") {
    // indexed image over our deterministic 64-entry palette; the JDK
    // writer may permute palette entries, so compare resolved RGB
    val pal = Array.tabulate(64 * 3)(i =>
      Multimodal.gifPaletteByte(i / 3, i % 3).toByte)
    val r = new Array[Byte](64); val g = new Array[Byte](64)
    val b = new Array[Byte](64)
    for (i <- 0 until 64) {
      r(i) = pal(3 * i); g(i) = pal(3 * i + 1); b(i) = pal(3 * i + 2)
    }
    val icm = new java.awt.image.IndexColorModel(8, 64, r, g, b)
    for (key <- keys; (w, h) <- shapes) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          Multimodal.synthPixelByte(key, y * w + x) % 64)
      val ours = Multimodal.decodeGif(encode(img, "gif"))
      assert(ours.width == w && ours.height == h, s"dims $key ${w}x$h")
      for (p <- 0 until w * h) {
        val ix = Multimodal.synthPixelByte(key, p) % 64
        for (c <- 0 until 3)
          assert(ours.rgb(3 * p + c) == Multimodal.gifPaletteByte(ix, c),
            s"gif $key ${w}x$h px $p ch $c")
      }
    }
  }

  test("wav: JDK-written files (mono and stereo) decode bit-exactly") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    for (key <- keys; channels <- Seq(1, 2); n <- Seq(1, 1000); rate <- Seq(8000, 44100)) {
      // interleaved PCM16LE frames from the synth formula
      val raw = new Array[Byte](n * channels * 2)
      for (i <- 0 until n * channels) {
        val v = Multimodal.synthSample(key, i)
        raw(2 * i) = (v & 0xff).toByte
        raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      val ours = Multimodal.decodeWav(out.toByteArray)
      assert(ours.sampleRate == rate && ours.channels == channels &&
        ours.bitsPerSample == 16, s"format $key ${channels}ch $n@$rate")
      assert(ours.samples.length == n * channels, s"count $key ${channels}ch")
      for (i <- 0 until n * channels)
        assert(ours.samples(i) == Multimodal.synthSample(key, i),
          s"wav $key ${channels}ch sample $i")
    }
  }

  test("jpeg gray: JDK-encoded real-AC streams decode within cross-IDCT tolerance") {
    // the JDK encoder quantizes real AC coefficients through its
    // standard tables — this exercises our AC run/size + ZRL + EOB
    // entropy decode on a stream we did not write. Ground truth is
    // the JDK's OWN re-decode of the same bytes: two independent
    // baseline decoders, each within T.81's ±1 of the exact IDCT, so
    // they may differ by 2.
    for (key <- keys; (w, h) <- shapes) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          Multimodal.synthPixelByte(key, y * w + x))
      val bytes = encode(img, "jpg")
      val ours = Multimodal.decodeJpeg(bytes)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ours.width == w && ours.height == h, s"dims $key ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val theirs = jdk.getRaster.getSample(x, y, 0)
        val mine = ours.pixels(y * w + x)
        assert(math.abs(mine - theirs) <= 2,
          s"jpeg $key ${w}x$h ($x,$y): ours=$mine jdk=$theirs")
      }
    }
  }
}
