package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.consumers.{Backtester, Trainer, TrainSplit}

class BacktesterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  // Mean-reversion on the sine FeatureLabelSet: long 1 below the band,
  // flat otherwise (mid oscillates around 10000 with amplitude 2000).
  private val holdOrFlip: Backtester.Strategy = { r =>
    val mid = r.getDouble(r.fieldIndex("mid_price"))
    if (mid < 9000) 1.0 else 0.0
  }

  test("sequential loop: trades happen and accounting is consistent") {
    val fls = SparkEntry.entry(spark)
    val res = Backtester.run(fls, "ts_us", "mid_price", holdOrFlip,
      initialCash = 100000.0, commissionRate = 0.001)
    assert(res.nTrades > 0)
    assert(res.commissionPaid > 0)
    assert(res.finalEquity == res.finalCash + res.finalPosition * res.lastPrice)
    assert(res.finalPosition == 0.0 || res.finalPosition == 1.0)
  }

  test("sharded backtest: per-shard independent portfolios, all complete") {
    val fls = SparkEntry.entry(spark)
    val results = Backtester.runSharded(fls, "ts_us", "mid_price", holdOrFlip,
      shards = 4, initialCash = 1000.0)
    assert(results.length == 4)
    assert(results.map(_.nTrades).sum > 0)
  }

  test("keyed trade log replays the sequential simulator per key") {
    // runKeyedTrades == Backtester.run per key: same trades, same final
    // cash/position — the distributed fold is the sequential loop.
    import org.apache.spark.sql.functions._
    val fls = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", expr("ts div 1000"))
      .select(col("event_type").as("instrument"), col("ts_us"),
        col("event_id").as("seq"), round(col("value")).as("price"),
        when(col("value") > 50, 1.0).otherwise(0.0).as("target"))
    val log = Backtester.runKeyedTrades(fls, "instrument", "ts_us", "seq",
        "price", "target")
      .collect().groupBy(_.getString(0))
    val strat: Backtester.Strategy =
      r => r.getDouble(r.fieldIndex("target"))
    for (k <- log.keys) {
      val seqRes = Backtester.run(
        fls.filter(col("instrument") === k).orderBy("ts_us", "seq"),
        "ts_us", "price", strat)
      val rows = log(k).sortBy(r => (r.getLong(1), r.getLong(2)))
      assert(rows.length.toLong == seqRes.nTrades)
      val last = rows.last
      assert(last.getDouble(last.fieldIndex("cash")) == seqRes.finalCash)
      assert(last.getDouble(last.fieldIndex("position")) == seqRes.finalPosition)
    }
  }

  test("fitLinear recovers exact coefficients on a linear target") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0 until 2000).map { i =>
      val a = i * 0.1
      val b = math.sin(i * 0.37) * 5.0
      (a, b, 3.0 + 2.0 * a - 0.5 * b)
    }.toDF("a", "b", "y").repartition(8)
    val m = Trainer.fitLinear(df, Seq("a", "b"), "y")
    assert(math.abs(m.intercept - 3.0) < 1e-6, s"intercept ${m.intercept}")
    assert(math.abs(m.weights(0) - 2.0) < 1e-8)
    assert(math.abs(m.weights(1) + 0.5) < 1e-8)
    // null rows are skipped, not poisoned
    val withNulls = df.unionByName(
      Seq((Double.NaN, 1.0, 1.0)).toDF("a", "b", "y"))
    val m2 = Trainer.fitLinear(withNulls, Seq("a", "b"), "y")
    assert(math.abs(m2.weights(0) - 2.0) < 1e-8)
  }

  test("fitExactMicros: exact integer recovery, truncation, singular guard") {
    val spark0 = spark
    import spark0.implicits._
    // exact-fit linear target -> micro weights are the coefficients x 1e6
    val lin = (0 until 200).map { i =>
      val x1 = (i % 13).toLong; val x2 = (i % 7).toLong
      (x1, x2, 3L - 2L * x1 + x2)
    }.toDF("x1", "x2", "y").repartition(8)
    assert(Trainer.fitExactMicros(lin, Seq("x1", "x2"), "y").toSeq ==
      Seq(3000000L, -2000000L, 1000000L))
    // non-integer solution truncates toward zero on BOTH signs
    val frac = Seq((0L, 0L, 0L), (3L, 1L, 1L), (6L, 5L, 2L))
      .toDF("x1", "x2", "y")
    assert(Trainer.fitExactMicros(frac, Seq("x1", "x2"), "y").toSeq ==
      Seq(0L, 333333L, 0L))
    val nfrac = Seq((0L, 0L, 0L), (3L, 1L, -1L), (6L, 5L, -2L))
      .toDF("x1", "x2", "y")
    assert(Trainer.fitExactMicros(nfrac, Seq("x1", "x2"), "y").toSeq ==
      Seq(0L, -333333L, 0L))
    // collinear features -> singular, refused
    val sing = (0 until 10).map(i => (i.toLong, 2L * i, i.toLong))
      .toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Trainer.fitExactMicros(sing, Seq("x1", "x2"), "y")
    }
  }

  test("model-backed strategy drives the backtest loop (inference path)") {
    // The flagship label is the sine a quarter period ahead — linearly
    // orthogonal to the features, so this pins the trainer->inference
    // WIRING (fit on the train slice, model called per event row in
    // the loop) plus determinism and accounting, not predictive skill.
    val fls = SparkEntry.entry(spark)
    val (train, test) = TrainSplit.timeSplit(fls, "ts_us", 0.7)
    val features = Seq("mid_price", "volatility")
    val model = Trainer.fitLinear(train, features, "label_mid_price")
    assert(model.weights.length == 2)

    val strat = Trainer.modelStrategy(model, fls.columns.toSeq, features,
      "mid_price")
    val res = Backtester.run(test, "ts_us", "mid_price", strat,
      initialCash = 100000.0, commissionRate = 0.001)
    assert(res.nTrades > 0)
    assert(res.finalEquity == res.finalCash + res.finalPosition * res.lastPrice)
    // determinism: refit + rerun = identical model and result
    val model2 = Trainer.fitLinear(train, features, "label_mid_price")
    assert(model2.intercept == model.intercept &&
      model2.weights.sameElements(model.weights))
    val res2 = Backtester.run(test, "ts_us", "mid_price", strat,
      initialCash = 100000.0, commissionRate = 0.001)
    assert(res2 == res)
  }

  test("model strategy goes flat on null or NaN features, never trades on noise") {
    val model = Trainer.LinearModel(0.0, Array(1.0))
    val strat = Trainer.modelStrategy(model, Seq("f", "price"), Seq("f"), "price")
    import org.apache.spark.sql.Row
    assert(strat(Row(null, 10.0)) == 0.0)
    assert(strat(Row(Double.NaN, 10.0)) == 0.0)
    assert(strat(Row(20.0, 10.0)) == 1.0)
    assert(strat(Row(5.0, 10.0)) == -1.0)
  }

  test("feature-matrix export: libsvm lines and parquet matrix round-trip") {
    val fls = SparkEntry.entry(spark)
    val features = Seq("mid_price", "volatility")
    val dir = java.nio.file.Files.createTempDirectory("graft_matrix").toString

    Trainer.exportLibsvm(fls, features, "label_mid_price", s"$dir/libsvm")
    val lines = spark.read.text(s"$dir/libsvm").collect().map(_.getString(0))
    val expected = fls.filter(org.apache.spark.sql.functions.col("label_mid_price").isNotNull)
      .count()
    assert(lines.length == expected)
    val parts = lines.head.split(" ")
    assert(parts.length == 3 && parts(1).startsWith("1:") && parts(2).startsWith("2:"))

    Trainer.exportMatrix(fls, features, "label_mid_price", s"$dir/matrix")
    val back = spark.read.parquet(s"$dir/matrix")
    assert(back.columns.toSeq == Seq("label", "features"))
    assert(back.count() == fls.count())
    assert(back.selectExpr("size(features)").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(2))
  }
}
