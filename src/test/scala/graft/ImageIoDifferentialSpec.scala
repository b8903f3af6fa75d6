package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Differential gate for the hand-rolled image codecs (r10 verdict
  * item 5): every synth payload must decode to the SAME pixels through
  * `javax.imageio` (the JDK's independent PNG/GIF/BMP/JPEG readers).
  * The graded oracles pin the decode→feature formulas; this catches
  * the class the formula can't — the encoder and decoder agreeing on
  * a shared mistake (e.g. both misplacing a zigzag index, both
  * flipping BMP rows the same wrong way).
  *
  * Tolerances: BMP/PNG/GIF are lossless → bit-exact. JPEG is decoded
  * by two independent IDCT implementations; T.81 Annex A allows ±1
  * per sample, so grayscale gets tolerance 1. Color adds the
  * fixed-point YCbCr→RGB rounding (same JFIF constants both sides,
  * ≤1 more) → tolerance 2. For 4:2:0 the JDK upsamples chroma with a
  * triangle filter while ours is box — the two agree only where every
  * contributing chroma sample is equal, i.e. away from chroma-block
  * (16-px) boundaries; the synth payload is chroma-constant per MCU,
  * so pixels with x%16 ∈ [2,13] and y%16 ∈ [2,13] are compared and
  * the 2-px boundary bands skipped (by construction, not hand-waving:
  * the triangle filter's support is the 2×2 chroma neighborhood, and
  * cx = x/2 stays in-block for exactly that interior range).
  */
class ImageIoDifferentialSpec extends AnyFunSuite {

  private def readImg(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode the synth payload")
    img
  }

  private val shapes = Seq((13, 7), (16, 16), (37, 22), (1, 1), (8, 31))
  private val keys = Seq(1L, 42L, 9999L)

  test("bmp: hand decoder matches ImageIO bit-exactly (BGR file order)") {
    for (key <- keys; (w, h) <- shapes) {
      val bytes = Multimodal.synthBmp(key, w, h)
      val ours = Multimodal.decodeBmp(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val k = (y * w + x) * 3
        // file (and our pixels array) stores B,G,R per BMP convention
        assert((ours.pixels(k) & 0xff) == (rgb & 0xff), s"B $key ($x,$y)")
        assert((ours.pixels(k + 1) & 0xff) == ((rgb >> 8) & 0xff), s"G $key ($x,$y)")
        assert((ours.pixels(k + 2) & 0xff) == ((rgb >> 16) & 0xff), s"R $key ($x,$y)")
      }
    }
  }

  test("png: hand decoder matches ImageIO bit-exactly (all 5 filters, split IDAT)") {
    for (key <- keys; (w, h) <- shapes) {
      val bytes = Multimodal.synthPng(key, w, h)
      val ours = Multimodal.decodePng(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val k = (y * w + x) * 3
        assert((ours.pixels(k) & 0xff) == ((rgb >> 16) & 0xff), s"R $key ($x,$y)")
        assert((ours.pixels(k + 1) & 0xff) == ((rgb >> 8) & 0xff), s"G $key ($x,$y)")
        assert((ours.pixels(k + 2) & 0xff) == (rgb & 0xff), s"B $key ($x,$y)")
      }
    }
  }

  test("gif: hand LZW decoder matches ImageIO bit-exactly") {
    for (key <- keys; (w, h) <- shapes) {
      val bytes = Multimodal.synthGif(key, w, h)
      val ours = Multimodal.decodeGif(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val k = (y * w + x) * 3
        assert(ours.rgb(k) == ((rgb >> 16) & 0xff), s"R $key ($x,$y)")
        assert(ours.rgb(k + 1) == ((rgb >> 8) & 0xff), s"G $key ($x,$y)")
        assert(ours.rgb(k + 2) == (rgb & 0xff), s"B $key ($x,$y)")
      }
    }
  }

  test("jpeg grayscale: hand IDCT within ±1 of ImageIO everywhere") {
    for (key <- keys; (w, h) <- shapes) {
      val bytes = Multimodal.synthJpeg(key, w, h)
      val ours = Multimodal.decodeJpeg(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      val raster = jdk.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val theirs = raster.getSample(x, y, 0)
        val mine = ours.pixels(y * w + x)
        assert(math.abs(mine - theirs) <= 1,
          s"gray $key ($x,$y): ours=$mine jdk=$theirs")
      }
    }
  }

  test("jpeg 4:4:4 color: hand decode within ±2 of ImageIO everywhere") {
    for (key <- keys; (w, h) <- shapes) {
      val bytes = Multimodal.synthJpegColor(key, w, h, chroma420 = false)
      val ours = Multimodal.decodeJpegColor(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(math.abs(ours.rgb(o) - ((rgb >> 16) & 0xff)) <= 2, s"R $key ($x,$y)")
        assert(math.abs(ours.rgb(o + 1) - ((rgb >> 8) & 0xff)) <= 2, s"G $key ($x,$y)")
        assert(math.abs(ours.rgb(o + 2) - (rgb & 0xff)) <= 2, s"B $key ($x,$y)")
      }
    }
  }

  test("animated gif: every frame matches ImageIO's frame-indexed reads bit-exactly") {
    for (key <- Seq(3L, 42L); (w, h, n) <- Seq((11, 9, 4), (16, 16, 3), (2, 31, 5))) {
      val bytes = Multimodal.synthGifAnimated(key, w, h, n)
      val ours = Multimodal.decodeGifFrames(bytes)
      assert(ours.length == n, s"frame count $key ${w}x$h")
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = javax.imageio.ImageIO.getImageReaders(in).next()
      reader.setInput(in)
      assert(reader.getNumImages(true) == n, s"jdk frame count $key")
      for (f <- 0 until n) {
        val jdk = reader.read(f)
        assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key f$f")
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = jdk.getRGB(x, y)
          val k = (y * w + x) * 3
          assert(ours(f).rgb(k) == ((rgb >> 16) & 0xff), s"R $key f$f ($x,$y)")
          assert(ours(f).rgb(k + 1) == ((rgb >> 8) & 0xff), s"G $key f$f ($x,$y)")
          assert(ours(f).rgb(k + 2) == (rgb & 0xff), s"B $key f$f ($x,$y)")
        }
      }
      reader.dispose()
      in.close()
    }
  }

  test("scene gif: ImageIO frame-indexed reads match the keyframe corpus bit-exactly") {
    // the mm_keyframes / mm_video_dups container (per-frame GCE +
    // scene-keyed content + one-pixel jitter, both cut orders) through
    // the JDK's independent reader — the conformance pin for the
    // newest GIF-emitting synth
    for (key <- Seq(3L, 42L, 300L); (perm, jf) <- Seq((0, 1), (1, 0))) {
      val bytes = Multimodal.synthGifScenes(key, 19, 17, 9, 3, perm, jf)
      val ours = Multimodal.decodeGifFrames(bytes)
      assert(ours.length == 9, s"frame count $key perm$perm")
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = javax.imageio.ImageIO.getImageReaders(in).next()
      reader.setInput(in)
      assert(reader.getNumImages(true) == 9, s"jdk frame count $key perm$perm")
      for (f <- 0 until 9) {
        val jdk = reader.read(f)
        for (y <- 0 until 17; x <- 0 until 19) {
          val rgb = jdk.getRGB(x, y)
          val k = (y * 19 + x) * 3
          assert(ours(f).rgb(k) == ((rgb >> 16) & 0xff) &&
            ours(f).rgb(k + 1) == ((rgb >> 8) & 0xff) &&
            ours(f).rgb(k + 2) == (rgb & 0xff),
            s"scene gif $key perm$perm f$f ($x,$y)")
        }
      }
      reader.dispose()
      in.close()
    }
  }

  test("gif: streams crossing the 4096 table-full LZW reset survive both gates") {
    // a 128x128 noise image grows the dictionary past 4096 several
    // times, so the clear-code reset interacts with the width-bump
    // pairing — the one LZW path the small differential shapes never
    // reach. Pin it both ways: round-trip vs the formula AND the JDK's
    // independent read of our bytes.
    val key = 77L
    val bytes = Multimodal.synthGif(key, 128, 128)
    val ours = Multimodal.decodeGif(bytes)
    for (p <- 0 until 128 * 128)
      assert(ours.indices(p) == Multimodal.synthPixelByte(key, p) % 64, s"px $p")
    val jdk = readImg(bytes)
    for (y <- 0 until 128; x <- 0 until 128) {
      val rgb = jdk.getRGB(x, y)
      val k = (y * 128 + x) * 3
      assert(ours.rgb(k) == ((rgb >> 16) & 0xff), s"R ($x,$y)")
      assert(ours.rgb(k + 1) == ((rgb >> 8) & 0xff), s"G ($x,$y)")
      assert(ours.rgb(k + 2) == (rgb & 0xff), s"B ($x,$y)")
    }
  }

  test("wav: hand decoder matches javax.sound.sampled bit-exactly") {
    // same differential discipline for the audio codec: the JDK ships
    // an independent RIFF/WAVE reader (AudioSystem); PCM16 is lossless
    // so every sample must match exactly, little-endian pairs re-read
    // from the raw frame stream
    for (key <- keys; n <- Seq(1, 100, 4097); rate <- Seq(8000, 44100)) {
      val bytes = Multimodal.synthWav(key, n, rate)
      val ours = Multimodal.decodeWav(bytes)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt == rate && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16, s"format $key $n@$rate")
      val raw = in.readAllBytes()
      in.close()
      assert(raw.length == n * 2, s"frame count $key $n@$rate")
      for (i <- 0 until n) {
        val theirs =
          if (fmt.isBigEndian)
            ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)).toShort
          else
            ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort
        assert(ours.samples(i) == theirs.toInt, s"sample $key $n@$rate [$i]")
      }
    }
  }

  test("jpeg 4:2:0 color: agrees with ImageIO away from chroma-block seams") {
    for (key <- keys; (w, h) <- Seq((37, 22), (16, 16), (48, 33))) {
      val bytes = Multimodal.synthJpegColor(key, w, h, chroma420 = true)
      val ours = Multimodal.decodeJpegColor(bytes)
      val jdk = readImg(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h, s"dims $key ${w}x$h")
      var compared = 0
      for (y <- 0 until h; x <- 0 until w
           if x % 16 >= 2 && x % 16 <= 13 && y % 16 >= 2 && y % 16 <= 13) {
        val rgb = jdk.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(math.abs(ours.rgb(o) - ((rgb >> 16) & 0xff)) <= 2, s"R $key ($x,$y)")
        assert(math.abs(ours.rgb(o + 1) - ((rgb >> 8) & 0xff)) <= 2, s"G $key ($x,$y)")
        assert(math.abs(ours.rgb(o + 2) - (rgb & 0xff)) <= 2, s"B $key ($x,$y)")
        compared += 1
      }
      assert(compared > 0, s"no interior pixels compared for ${w}x$h")
    }
  }

  test("gif compositing inputs match ImageIO metadata (disposal, transparency, offsets)") {
    // the compositor's INPUTS — per-frame disposal method, transparent
    // index, and placement — cross-checked against the JDK's own parse
    // of the same container, so a GCE bit-position mistake cannot hide
    // behind a matching encoder/decoder pair
    val bytes = Multimodal.synthGifComposited(11L, 13, 11)
    val ours = Multimodal.decodeGifFrames(bytes)
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) == 4)
    val jdkNames = Seq("doNotDispose", "restoreToBackgroundColor",
      "restoreToPrevious", "doNotDispose")
    for (f <- 0 until 4) {
      val tree = reader.getImageMetadata(f)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gce = tree.getElementsByTagName("GraphicControlExtension")
        .item(0).asInstanceOf[org.w3c.dom.Element]
      assert(gce.getAttribute("disposalMethod") == jdkNames(f), s"f$f disposal")
      val transparent = gce.getAttribute("transparentColorFlag") == "TRUE"
      assert(transparent == (ours(f).transparentIndex >= 0), s"f$f trans flag")
      if (transparent)
        assert(gce.getAttribute("transparentColorIndex").toInt ==
          ours(f).transparentIndex, s"f$f trans index")
      val desc = tree.getElementsByTagName("ImageDescriptor")
        .item(0).asInstanceOf[org.w3c.dom.Element]
      assert(desc.getAttribute("imageLeftPosition").toInt == ours(f).left, s"f$f left")
      assert(desc.getAttribute("imageTopPosition").toInt == ours(f).top, s"f$f top")
      assert(desc.getAttribute("imageWidth").toInt == ours(f).width, s"f$f w")
      assert(desc.getAttribute("imageHeight").toInt == ours(f).height, s"f$f h")
    }
    reader.dispose()
    in.close()
  }
}
