package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.consumers.Backtester

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
}
