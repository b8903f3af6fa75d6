package graft.tools

import graft.operators.Multimodal

/** Stage timing for the mm_phash_lossy_dups per-doc cost (board-
  * slowest query at 15.5 s / sf0.1): splits the 256x256 per-doc wall
  * into synth-encode / decode / hash for BOTH parities, single
  * thread, so the pixel-linear claim in SCALE.md r13 is backed by a
  * per-stage breakdown rather than an aggregate.
  *
  * Run: sbt "runMain graft.tools.LossyPerfProbe 400"
  */
object LossyPerfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 400
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up (JIT)
    (0 until 50).foreach { g =>
      val img = Multimodal.decodeJpeg(Multimodal.synthJpegWide(g, 256, 256))
      Multimodal.phashDct64(img.width, img.height,
        Multimodal.grayToRgb(img.pixels))
      val px = Multimodal.jpegWidePixels(g, 256, 256, None, 0)
      val p = Multimodal.decodePng(Multimodal.encodePng(256, 256, px))
      Multimodal.phashDct64(p.width, p.height, p.pixels)
    }

    // JPEG side
    val (jpegs, tJe) = time((0 until n).map(g =>
      Multimodal.synthJpegWide(g.toLong, 256, 256)))
    val (decs, tJd) = time(jpegs.map(Multimodal.decodeJpeg))
    val (rgbs, tJr) = time(decs.map(d => Multimodal.grayToRgb(d.pixels)))
    val (_, tJh) = time(rgbs.zip(decs).map { case (r, d) =>
      Multimodal.phashDct64(d.width, d.height, r) })
    println(f"[perf] jpeg side ($n docs): synth+encode=$tJe%.2f s " +
      f"decode=$tJd%.2f s grayToRgb=$tJr%.2f s dct-hash=$tJh%.2f s " +
      f"(bytes/doc=${jpegs.map(_.length).sum / n}%d)")

    // PNG side
    val (pxs, tPs) = time((0 until n).map(g =>
      Multimodal.jpegWidePixels(g.toLong, 256, 256, None, 0)))
    val (pngs, tPe) = time(pxs.map(p => Multimodal.encodePng(256, 256, p)))
    val (pdec, tPd) = time(pngs.map(Multimodal.decodePng))
    val (_, tPh) = time(pdec.map(p =>
      Multimodal.phashDct64(p.width, p.height, p.pixels)))
    println(f"[perf] png side ($n docs): pixels=$tPs%.2f s encode=$tPe%.2f s " +
      f"decode=$tPd%.2f s dct-hash=$tPh%.2f s " +
      f"(bytes/doc=${pngs.map(_.length).sum / n}%d)")
  }
}
