package graft.tools

import graft.operators.Multimodal

/** Sizing probe for the DCT perceptual hash's graded-query knobs (no
  * Spark — the hash is a pure function). Measures, over the gid range
  * the graded corpus uses (sf0.1 ⇒ gid < 2500):
  *
  *   1. the perturbation flip distribution of [[Multimodal.phashDct64]]
  *      for candidate single-pixel deltas — the graded query needs the
  *      planted odd-twin perturbation to stay within the hamming-3 match
  *      radius on (almost) every gid, and to flip >0 bits on some;
  *   2. unrelated-pair separation: no two DIFFERENT-gid hashes may land
  *      within the match radius, or the graded output would pair
  *      unrelated docs (fine for the oracle compare — both sides replay
  *      the same formula — but it would make the query's semantics
  *      mushy);
  *   3. the same two numbers for [[Multimodal.dhash64]] as the
  *      reference point.
  *
  * Run: sbt "runMain graft.tools.PhashProbe"
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2500
    val w = 19
    val h = 17

    val base = (0 until n).map { gid =>
      Multimodal.phashDct64(w, h, Multimodal.synthGrayImage(gid.toLong, w, h))
    }.toArray

    for (delta <- Seq(8, 16, 24, 32, 48, 64, 128)) {
      val flips = (0 until n).map { gid =>
        val pcell = Some(((gid % 8), (gid % 9)))
        val hp = Multimodal.phashDct64(w, h,
          Multimodal.synthGrayImage(gid.toLong, w, h, pcell, delta))
        java.lang.Long.bitCount(base(gid) ^ hp)
      }
      val hist = flips.groupBy(identity).view.mapValues(_.size).toMap
      val over = flips.count(_ > 3)
      println(f"dct delta=$delta: max=${flips.max} mean=${flips.sum.toDouble / n}%.2f over3=$over hist=${hist.toSeq.sortBy(_._1).mkString(",")}")
    }

    var minD = 64
    var within3 = 0L
    var sumD = 0L
    var pairs = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = java.lang.Long.bitCount(base(i) ^ base(j))
        if (d < minD) minD = d
        if (d <= 3) within3 += 1
        sumD += d
        pairs += 1
        j += 1
      }
      i += 1
    }
    println(f"dct unrelated: min=$minD within3=$within3 mean=${sumD.toDouble / pairs}%.1f over $pairs pairs")

    // dHash reference on the same corpus
    val dbase = (0 until n).map { gid =>
      Multimodal.dhash64(w, h, Multimodal.synthGrayImage(gid.toLong, w, h))
    }.toArray
    var dmin = 64
    var dwithin = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = java.lang.Long.bitCount(dbase(i) ^ dbase(j))
        if (d < dmin) dmin = d
        if (d <= 3) dwithin += 1
        j += 1
      }
      i += 1
    }
    println(s"dhash unrelated: min=$dmin within3=$dwithin")
    // per-gid flips at delta 24 for the spec's small fixture range
    val f24 = (0 until math.min(12, n)).map { gid =>
      val hp = Multimodal.phashDct64(w, h,
        Multimodal.synthGrayImage(gid.toLong, w, h,
          Some(((gid % 8), (gid % 9))), 24))
      gid -> java.lang.Long.bitCount(base(gid) ^ hp)
    }
    println(s"dct delta=24 gid flips 0..11: ${f24.mkString(",")}")

    // LOSSY boundary, two content regimes (the hashes are
    // complementary):
    //  (a) BROADBAND texture (blurred noise, contrast-stretched) — the
    //      natural-image regime pHash targets: every low-frequency
    //      coefficient carries signal, so JPEG quantization noise
    //      cannot reach the median boundary;
    //  (b) low-contrast smooth ramp + high-frequency checker — here
    //      adjacent-cell luma differences are sub-noise and dHash
    //      collapses, while most DCT coefficients are near zero and
    //      the median threshold wobbles.
    import java.awt.image.BufferedImage
    def jpegRoundtrip(sw: Int, sh: Int, lum: (Int, Int) => Int): (Int, Int) = {
      val rgb = new Array[Byte](sw * sh * 3)
      for (y <- 0 until sh; x <- 0 until sw) {
        val v = lum(x, y).toByte
        val p = (y * sw + x) * 3
        rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
      }
      val viaPng = Multimodal.decodePng(Multimodal.encodePng(sw, sh, rgb))
      val img = new BufferedImage(sw, sh, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until sh; x <- 0 until sw)
        img.getRaster.setSample(x, y, 0, lum(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      val jp = Multimodal.decodeJpeg(out.toByteArray)
      val rgbJ = new Array[Byte](sw * sh * 3)
      for (k <- 0 until sw * sh) {
        val v = jp.pixels(k).toByte
        rgbJ(3 * k) = v; rgbJ(3 * k + 1) = v; rgbJ(3 * k + 2) = v
      }
      (java.lang.Long.bitCount(
        Multimodal.phashDct64(sw, sh, viaPng.pixels) ^
          Multimodal.phashDct64(sw, sh, rgbJ)),
        java.lang.Long.bitCount(
          Multimodal.dhash64(sw, sh, viaPng.pixels) ^
            Multimodal.dhash64(sw, sh, rgbJ)))
    }
    for (key <- Seq(1L, 7L, 42L, 99L)) {
      def blur(x: Int, y: Int): Int = {
        var acc = 0
        for (dy <- -2 to 2; dx <- -2 to 2) {
          val px = math.max(0, math.min(31, x + dx))
          val py = math.max(0, math.min(31, y + dy))
          acc += Multimodal.phashPixelByte(key, py * 32 + px)
        }
        acc / 25
      }
      def lumA(x: Int, y: Int): Int =
        math.max(0, math.min(255, 2 * (blur(x, y) - 128) + 128))
      val (pA, dA) = jpegRoundtrip(32, 32, lumA)
      println(s"lossy broadband key=$key: phash=$pA dhash=$dA")
    }
    for (amp <- Seq(2, 4)) {
      def lumB(x: Int, y: Int): Int =
        120 + (x + y) / 8 + ((x + y) % 2) * amp
      val (pB, dB) = jpegRoundtrip(64, 64, lumB)
      println(s"lossy low-contrast amp=$amp: phash=$pB dhash=$dB")
    }

    // brightness shift: +20 on every pixel
    for (gid <- Seq(3L, 7L)) {
      val a = Multimodal.synthGrayImage(gid, w, h)
      val b2 = a.map(v => math.min(255, (v & 0xff) + 20).toByte)
      val dP = java.lang.Long.bitCount(
        Multimodal.phashDct64(w, h, a) ^ Multimodal.phashDct64(w, h, b2))
      val dD = java.lang.Long.bitCount(
        Multimodal.dhash64(w, h, a) ^ Multimodal.dhash64(w, h, b2))
      println(s"brightness gid=$gid: phash=$dP dhash=$dD")
    }
  }
}
