package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Property-style tests for the as-of join (SURVEY §5 test plan):
  * results are (1) exactly the brute-force backward lookup and (2)
  * invariant under input repartitioning — the prev-block-seeding bug
  * class (J2) the reference guards with per-block fixtures.
  */
class AsofPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("asof == brute force, and is repartition-invariant (8 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val lts = Seq.fill(40)(rnd.nextLong(200L)).distinct
      val rts = Seq.fill(25)(rnd.nextLong(200L)).distinct

      val l = lts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("ts_us", "lid")
      val r = rts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("ts_us", "rid")

      def collectMap(lf: org.apache.spark.sql.DataFrame,
          rf: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        AsofJoin.asofJoin(lf, rf, "ts_us", rightPrefix = "r",
            rightTieBreak = Some("rid"))
          .collect()
          .map(x => (x.getLong(x.fieldIndex("ts_us")),
            if (x.isNullAt(x.fieldIndex("r_rid"))) -1L
            else x.getLong(x.fieldIndex("r_rid"))))
          .toMap

      val out = collectMap(l, r)
      val rSorted = rts.zipWithIndex
      lts.foreach { t =>
        val expect = rSorted.filter(_._1 <= t) match {
          case Nil => -1L
          case xs =>
            val best = xs.map(_._1).max
            xs.filter(_._1 == best).map(_._2.toLong).max
        }
        assert(out(t) == expect, s"seed=$seed left ts=$t")
      }

      val out2 = collectMap(l.repartition(7), r.repartition(5))
      assert(out2 == out, s"seed=$seed repartition changed results")
    }
  }

  test("forward and nearest asof == brute force (8 seeds)") {
    import spark.implicits._
    for (seed <- 101 to 108) {
      val rnd = new scala.util.Random(seed)
      val lts = Seq.fill(40)(rnd.nextLong(200L)).distinct
      val rts = Seq.fill(25)(rnd.nextLong(200L)).distinct
      val l = lts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("ts_us", "lid")
      val r = rts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("ts_us", "rid")

      def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(x => (x.getLong(x.fieldIndex("ts_us")),
          if (x.isNullAt(x.fieldIndex("r_rid"))) -1L
          else x.getLong(x.fieldIndex("r_rid")))).toMap

      val fwd = asMap(AsofJoin.asofJoinForward(l, r, "ts_us",
        rightPrefix = "r", rightTieBreak = Some("rid")))
      val near = asMap(AsofJoin.asofJoinNearest(l, r, "ts_us",
        rightPrefix = "r", rightTieBreak = Some("rid")))
      val rIdx = rts.zipWithIndex
      lts.foreach { t =>
        // forward: earliest right ts >= t (rts distinct -> no ties)
        val fExpect = rIdx.filter(_._1 >= t) match {
          case Nil => -1L
          case xs => xs.minBy(_._1)._2.toLong
        }
        assert(fwd(t) == fExpect, s"seed=$seed forward ts=$t")
        // nearest: min |distance|, distance ties resolved backward
        val nExpect =
          if (rIdx.isEmpty) -1L
          else {
            val best = rIdx.map(x => math.abs(x._1 - t)).min
            rIdx.filter(x => math.abs(x._1 - t) == best)
              .minBy(_._1)._2.toLong // smaller ts = backward wins
          }
        assert(near(t) == nExpect, s"seed=$seed nearest ts=$t")
      }
    }
  }
}
