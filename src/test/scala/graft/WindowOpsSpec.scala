package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WindowOps

/** Golden semantics for the window feature operators (svoe A1/A3/A6
  * fixtures, FIXTURES.md §2). */
class WindowOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // (ts_us, id, price, amount): two 10us buckets
  private def trades = Seq(
    (0L, 1L, 10.0, 1.0), (3L, 2L, 12.0, 2.0), (9L, 3L, 8.0, 1.0),
    (10L, 4L, 20.0, 1.0), (15L, 5L, 18.0, 3.0)
  ).toDF("ts_us", "id", "price", "amount")

  private val okey = WindowOps.orderKey(col("ts_us"), col("id"))

  test("approx quantiles stay within the sketch's rank-error bound") {
    // GK guarantee: the returned value's rank is within n/accuracy of
    // the target rank. Checked per event_type against the fully-sorted
    // values at sf0.001 — the same data the exact oracle query reads.
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val accuracy = 100
    val probs = Seq(0.5, 0.9, 0.99)
    val approx = WindowOps.approxQuantiles(events, col("value"),
        Seq(col("event_type")), probs, accuracy)
      .collect().map(r => r.getString(0) ->
        probs.indices.map(i => r.getDouble(i + 1))).toMap
    val exactVals = events.select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet == exactVals.keySet)
    for ((et, sorted) <- exactVals; (p, i) <- probs.zipWithIndex) {
      val n = sorted.length
      val v = approx(et)(i)
      // rank of v among the sorted values (first index with value >= v)
      val rank = sorted.indexWhere(_ >= v) match {
        case -1 => n
        case r  => r
      }
      val target = p * n
      val tol = n.toDouble / accuracy + 1 // +1: discrete rank granularity
      assert(math.abs(rank - target) <= tol,
        s"$et p$p: value $v at rank $rank, target $target, tol $tol")
    }
  }

  test("approxQuantileBounds: window edges bracket the sketch, all within_bound") {
    val dir = "/root/testdata/sf0.001"
    val out = WindowOps.approxQuantileBounds(Tables.events(spark, dir),
        col("value"), Seq("event_type"), Seq(0.5, 0.9, 0.99), accuracy = 100)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("lo_val")) <= r.getDouble(r.fieldIndex("hi_val")))
      assert(r.getBoolean(r.fieldIndex("within_bound")),
        s"sketch outside its rank window: $r")
    }
  }

  test("approxQuantileBounds: degenerate group sizes (1, 2) stay in-bound") {
    val spark0 = spark
    import spark0.implicits._
    val tiny = Seq(("a", 5.0), ("b", 1.0), ("b", 9.0)).toDF("k", "v")
    val out = WindowOps.approxQuantileBounds(tiny, col("v"), Seq("k"),
        Seq(0.5, 0.99), accuracy = 10000)
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")), s"row $r")
    }
    // singleton group: both edges are the single value
    val a = out.filter(_.getString(0) == "a")
    assert(a.forall(r => r.getDouble(r.fieldIndex("lo_val")) == 5.0 &&
      r.getDouble(r.fieldIndex("hi_val")) == 5.0))
  }

  test("OHLCV golden: open/high/low/close/volume/vwap per bucket") {
    val out = WindowOps.ohlcv(trades, col("ts_us"), okey, col("price"),
        col("amount"), 10L, Nil)
      .orderBy("bucket_us").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getLong(b0.fieldIndex("bucket_us")) == 0L)
    assert(b0.getDouble(b0.fieldIndex("open")) == 10.0)
    assert(b0.getDouble(b0.fieldIndex("high")) == 12.0)
    assert(b0.getDouble(b0.fieldIndex("low")) == 8.0)
    assert(b0.getDouble(b0.fieldIndex("close")) == 8.0)
    assert(b0.getDouble(b0.fieldIndex("volume")) == 4.0)
    // vwap = (10*1 + 12*2 + 8*1) / 4 = 42/4
    assert(b0.getDouble(b0.fieldIndex("vwap")) == 10.5)
    assert(b0.getLong(b0.fieldIndex("num_trades")) == 3L)
    val b1 = out(1)
    assert(b1.getDouble(b1.fieldIndex("open")) == 20.0)
    assert(b1.getDouble(b1.fieldIndex("close")) == 18.0)
  }

  test("TVI golden: sided notional imbalance over lookback") {
    // buys: 100 notional at t=0; sells: 50 at t=5 -> tvi = 2*50/150
    val df = Seq((0L, 1L, true, 100.0), (5L, 2L, false, 50.0))
      .toDF("ts_us", "id", "is_buy", "notional")
    val ok = WindowOps.orderKey(col("ts_us"), col("id"))
    val out = df.select(WindowOps.tvi(col("notional"), col("is_buy"),
        Nil, ok, 10L).as("tvi"))
      .orderBy("tvi").collect()
    assert(out(1).getDouble(0) == 2.0) // first event: only buys -> 2(b-0)/b
    assert(math.abs(out(0).getDouble(0) - 2.0 * 50 / 150) < 1e-15)
  }

  test("downsample keeps every nth in order; delimited groups count") {
    val df = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("ts_us", "id")
    val ok = WindowOps.orderKey(col("ts_us"), col("id"))
    val kept = WindowOps.downsample(df, Nil, ok, 3)
      .orderBy("ts_us").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L, 4L, 7L, 10L))

    val ev = Seq((1L, "S"), (2L, "x"), (3L, "S"), (4L, "x"))
      .toDF("ts_us", "t")
    val gid = ev.withColumn("g", WindowOps.delimitedGroupId(col("t") === "S",
        Nil, col("ts_us")))
      .orderBy("ts_us").collect().map(_.getLong(2))
    assert(gid.toSeq == Seq(1L, 1L, 2L, 2L))
  }
}
