package graft.tools

import graft.operators.Multimodal

/** Measurement probe behind the r14 (F,T) agreement-regime corpus
  * (see SCALE.md r14): which INTEGER, SQL-replayable edit moves a
  * dHash beyond its match radius while leaving the DCT hash inside
  * its own — the "blur / low-frequency-preserving edit" regime the
  * r12 JDK differential demonstrated only at unit level. Candidates
  * are exact-integer convolutions of the synth gray plane (clamped
  * borders, floor division — both replayable verbatim in DuckDB):
  *
  *   bh3: horizontal (l + c + r) // 3
  *   bw3: center-weighted (l + 2c + r) // 4
  *   bb3: full 3x3 box sum // 9
  *
  * For each kernel the probe prints the joint (d_dhash, d_dct)
  * outcome counts over the first `gids` content groups — the (F,T)
  * cell is d_dhash > 3 && d_dct <= 3 (dHash would MISS the pair, DCT
  * catches it). Run: sbt "runMain graft.tools.BlurRegimeProbe". */
object BlurRegimeProbe {

  /** Gray plane of a synth image as ints (one value per pixel). */
  def grayPlane(rgb: Array[Byte], w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => rgb(3 * i) & 0xFF)

  /** Integer convolution with CLAMPED coordinates; weights row-major
    * over the (2r+1)x(2r+1) window, divided by `den` (floor). */
  def convolve(g: Array[Int], w: Int, h: Int, r: Int,
      weights: Array[Int], den: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0L
        var k = 0
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) {
            val sy = math.min(h - 1, math.max(0, y + dy))
            val sx = math.min(w - 1, math.max(0, x + dx))
            acc += g(sy * w + sx).toLong * weights(k)
            k += 1
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = (acc / den).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  def toRgb(g: Array[Int]): Array[Byte] = {
    val px = new Array[Byte](g.length * 3)
    var i = 0
    while (i < g.length) {
      val v = g(i).toByte
      px(3 * i) = v; px(3 * i + 1) = v; px(3 * i + 2) = v
      i += 1
    }
    px
  }

  def main(args: Array[String]): Unit = {
    val gids = args.headOption.map(_.toLong).getOrElse(2500L)
    val w = 19; val h = 17
    val kernels = Seq(
      ("bh3", 1, Array(0, 0, 0, 1, 1, 1, 0, 0, 0), 3),
      ("bw3", 1, Array(0, 0, 0, 1, 2, 1, 0, 0, 0), 4),
      ("bb3", 1, Array.fill(9)(1), 9))
    for ((name, r, wts, den) <- kernels) {
      val cells = scala.collection.mutable.Map.empty[(Boolean, Boolean), Int]
      var sumD = 0L; var sumC = 0L
      var ft = List.empty[Long]
      for (gid <- 0L until gids) {
        val rgb = Multimodal.synthGrayImage(gid, w, h)
        val g0 = grayPlane(rgb, w, h)
        // bw3 is the elected corpus rule — route it through the
        // LIBRARY operator so the probe can never describe a stale
        // kernel; the unelected candidates stay on the generic form
        val blurred =
          if (name == "bw3") Multimodal.blurH121(w, h, rgb)
          else toRgb(convolve(g0, w, h, r, wts, den))
        val d = java.lang.Long.bitCount(
          Multimodal.dhash64(w, h, rgb) ^ Multimodal.dhash64(w, h, blurred))
        val c = java.lang.Long.bitCount(
          Multimodal.phashDct64(w, h, rgb) ^
            Multimodal.phashDct64(w, h, blurred))
        sumD += d; sumC += c
        val key = (d <= 3, c <= 3)
        cells(key) = cells.getOrElse(key, 0) + 1
        if (d > 3 && c <= 3 && ft.length < 8) ft ::= gid
      }
      println(f"$name: mean d_dhash=${sumD * 1.0 / gids}%.2f " +
        f"mean d_dct=${sumC * 1.0 / gids}%.2f cells(dup_d,dup_c)=" +
        s"${cells.toSeq.sortBy(_._1.toString).mkString(" ")} " +
        s"FT-examples=${ft.reverse.mkString(",")}")
    }
  }
}
