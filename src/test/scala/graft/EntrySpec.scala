package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("flagship FeatureLabelSet: rows > 0, label leads mid_price by 5s") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ==
      Seq("ts_us", "label_mid_price", "mid_price", "volatility"))
    val rows = df.orderBy("ts_us").collect()
    // 3600 1s samples, trailing 5s truncated by the lookahead.
    assert(rows.length == 3595)
    // label at t == mid_price at t+5s (sine is 1s-sampled, so the asof
    // probe lands exactly on a sample).
    val byTs = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.take(100).foreach { r =>
      val t = r.getLong(0)
      assert(r.getDouble(1) == byTs(t + 5000000L), s"label mismatch at $t")
    }
    // volatility of first row (single sample) is 0
    assert(rows.head.getDouble(3) == 0.0)
  }
}
