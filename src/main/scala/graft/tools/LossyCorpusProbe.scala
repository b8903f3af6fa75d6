package graft.tools

import graft.operators.Multimodal

/** Corpus-shape probe behind mm_phash_lossy_dups (SCALE.md r13):
  * hamming structure of the cross-codec JPEG/PNG corpus — within-pair
  * histogram (the graded signal), perturbation escapes, and all-pairs
  * cross-gid pollution within the match radius. This probe caught the
  * mod-64 block-rule collapse (b^2 loses every gy term on a 32-wide
  * block grid -> degenerate spectra, hamming-0 collisions between
  * unrelated gids, 25-bit one-pixel perturbation flips) and validated
  * the prime-251 mix: at 2500 gids, ZERO cross-gid pairs within
  * radius, min cross distance 6. */
object LossyCorpusProbe {
  def hashOf(id: Long): Long = {
    val gid = id / 2
    if (id % 2 == 0) {
      val img = Multimodal.decodeJpeg(Multimodal.synthJpegWide(gid, 256, 256))
      Multimodal.phashDct64(img.width, img.height,
        Multimodal.grayToRgb(img.pixels))
    } else {
      val pcell =
        if (gid % 5 == 0) Some(((gid % 32).toInt, ((gid * 7) % 32).toInt))
        else None
      val px = Multimodal.jpegWidePixels(gid, 256, 256, pcell, 24)
      val p = Multimodal.decodePng(Multimodal.encodePng(256, 256, px))
      Multimodal.phashDct64(p.width, p.height, p.pixels)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 500
    val hs = (0L until nDocs.toLong).map(id => id -> hashOf(id))
    // within-pair hamming (the graded signal)
    val within = (0L until nDocs.toLong / 2).map { gid =>
      val a = hs((2 * gid).toInt)._2
      val b = hs((2 * gid + 1).toInt)._2
      java.lang.Long.bitCount(a ^ b)
    }
    val hist = within.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (d, xs) => s"$d:${xs.size}" }.mkString(" ")
    println(s"[lossy] within-pair hamming hist: $hist")
    println(s"[lossy] perturbed escapes (>3): " +
      within.zipWithIndex.count { case (d, g) => d > 3 })
    // cross-gid pollution: pairs at hamming <= 3 whose gids differ
    var cross = 0
    var minCross = 64
    var i = 0
    while (i < nDocs) {
      var j = i + 1
      while (j < nDocs) {
        if (i / 2 != j / 2) {
          val d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
          if (d < minCross) minCross = d
          if (d <= 3) cross += 1
        }
        j += 1
      }
      i += 1
    }
    println(s"[lossy] cross-gid pairs <= 3: $cross (min cross dist $minCross)")
  }
}
