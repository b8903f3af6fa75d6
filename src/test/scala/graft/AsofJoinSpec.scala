package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Golden tests ported from the reference's as-of join fixtures
  * (FIXTURES.md §3; svoe `blocks/test_blocks.py:84-120`). */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("merge_asof_multi golden (test_blocks.py:84-100)") {
    val a = Seq(4L, 7L, 9L, 14L, 16L, 20L).zipWithIndex
      .map { case (t, i) => (t, s"a$i") }.toDF("ts_us", "a")
    val b = Seq(2L, 5L, 6L, 8L, 10L, 11L, 12L, 18L).zipWithIndex
      .map { case (t, i) => (t, s"b$i") }.toDF("ts_us", "b")
    val c = Seq(1L, 3L, 7L, 10L, 19L).zipWithIndex
      .map { case (t, i) => (t, s"c$i") }.toDF("ts_us", "c")

    val out = AsofJoin.pointInTimeJoin(a, Seq(("", b), ("", c)), "ts_us")
      .orderBy("ts_us")
      .select("ts_us", "a", "b", "c")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

    val expected = Seq(
      (4L, "a0", "b0", "c1"), (7L, "a1", "b2", "c2"), (9L, "a2", "b3", "c2"),
      (14L, "a3", "b6", "c3"), (16L, "a4", "b6", "c3"), (20L, "a5", "b7", "c4"))
    assert(out.toSeq == expected)
  }

  test("lookahead shift golden, lookahead=3 (test_blocks.py:103-120)") {
    val ts = Seq(1L, 2L, 3L, 5L, 8L, 9L, 20L, 21L, 22L, 23L, 28L, 31L, 32L,
      33L, 34L, 40L, 41L, 42L, 46L)
    val df = ts.map(t => (t, s"v$t")).toDF("ts_us", "v")

    val out = AsofJoin.lookaheadShift(df, "ts_us", 3L)
      .orderBy("ts_us")
      .select("ts_us", "label_v")
      .collect()
      .map(r => r.getString(1))

    val expected = Seq("v3", "v5", "v5", "v8", "v9", "v9", "v23", "v23",
      "v23", "v23", "v31", "v34", "v34", "v34", "v34", "v42", "v42", "v42")
    assert(out.toSeq == expected)
  }

  test("asof left join: unmatched left rows keep nulls") {
    val l = Seq((1L, "x"), (10L, "y")).toDF("ts_us", "lv")
    val r = Seq((5L, 1.5)).toDF("ts_us", "rv")
    val out = AsofJoin.asofJoin(l, r, "ts_us")
      .orderBy("ts_us").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("rv")))
    assert(out(1).getDouble(out(1).fieldIndex("rv")) == 1.5)
  }

  test("backward-inclusive tie: right row at exactly left ts is visible") {
    val l = Seq((5L, "x")).toDF("ts_us", "lv")
    val r = Seq((5L, "hit"), (4L, "miss")).toDF("ts_us", "rv")
    val out = AsofJoin.asofJoin(l, r, "ts_us").collect()
    assert(out(0).getString(out(0).fieldIndex("rv")) == "hit")
  }

  test("forward as-of: earliest following right row, inclusive at equal ts") {
    val l = Seq(4L, 7L, 9L, 14L, 20L).zipWithIndex
      .map { case (t, i) => (t, s"a$i") }.toDF("ts_us", "a")
    val r = Seq(2L, 5L, 6L, 9L, 18L).zipWithIndex
      .map { case (t, i) => (t, s"b$i") }.toDF("ts_us", "b")
    val out = AsofJoin.asofJoinForward(l, r, "ts_us")
      .orderBy("ts_us").select("ts_us", "a", "b")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    // 4 -> b1 (5), 7 -> b3 (9), 9 -> b3 (inclusive), 14 -> b4 (18),
    // 20 -> null (no following row)
    assert(out.toSeq == Seq(
      (4L, "a0", "b1"), (7L, "a1", "b3"), (9L, "a2", "b3"),
      (14L, "a3", "b4"), (20L, "a4", null)))
  }

  test("nearest as-of: minimal |distance|, ties resolved backward") {
    val l = Seq(4L, 7L, 10L, 20L).zipWithIndex
      .map { case (t, i) => (t, s"a$i") }.toDF("ts_us", "a")
    val r = Seq(2L, 6L, 8L, 30L).zipWithIndex
      .map { case (t, i) => (t, s"b$i") }.toDF("ts_us", "b")
    val out = AsofJoin.asofJoinNearest(l, r, "ts_us")
      .orderBy("ts_us").select("ts_us", "a", "b")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    // 4: dist 2 both ways (2 vs 6) -> backward b0; 7: 6(d1) vs 8(d1)
    // tie -> backward b1; 10: 8(d2) vs 30(d20) -> b2; 20: 8(d12) vs
    // 30(d10) -> forward b3
    assert(out.toSeq == Seq(
      (4L, "a0", "b0"), (7L, "a1", "b1"), (10L, "a2", "b2"), (20L, "a3", "b3")))
  }

  test("range-partitioned global as-of == single-window global as-of") {
    // Deterministic pseudo-random interleaving; 8 range partitions force
    // carries across many boundaries (incl. partitions with no right
    // rows at the head).
    val leftTs = (0 until 500).map(i => (i * 7L + 3) % 1000)
    val rightTs = (0 until 300).map(i => (i * 13L + 1) % 1000)
    val l = leftTs.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("ts_us", "lid")
    val r = rightTs.zipWithIndex.map { case (t, i) => (t, i.toLong, t * 2.0) }
      .toDF("ts_us", "rid", "rv")

    val viaWindow = AsofJoin
      .asofJoin(l, r, "ts_us", rightPrefix = "r", rightTieBreak = Some("rid"))
    val viaRange = AsofJoin
      .asofJoinRangePartitioned(l, r, "ts_us", rightPrefix = "r",
        numPartitions = 8, rightTieBreak = Some("rid"))
    assert(viaWindow.columns.toSeq == viaRange.columns.toSeq)
    val w = viaWindow.orderBy("ts_us", "lid").collect().map(_.toSeq).toSeq
    val g = viaRange.orderBy("ts_us", "lid").collect().map(_.toSeq).toSeq
    assert(g == w)
    assert(g.nonEmpty)

    // numPartitions = 0 auto-sizes the exchange from the inputs' size
    // estimate; results must be identical for ANY partition count
    val viaAuto = AsofJoin
      .asofJoinRangePartitioned(l, r, "ts_us", rightPrefix = "r",
        numPartitions = 0, rightTieBreak = Some("rid"))
    assert(viaAuto.orderBy("ts_us", "lid").collect().map(_.toSeq).toSeq == w)
  }
}
