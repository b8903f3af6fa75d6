package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.consumers.TrainSplit

class TrainSplitSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("label discovery + leakage-safe time split on the FeatureLabelSet") {
    val fls = SparkEntry.entry(spark)
    assert(TrainSplit.labelCols(fls) == Seq("label_mid_price"))
    assert(TrainSplit.featureCols(fls, "ts_us") == Seq("mid_price", "volatility"))

    val (train, test) = TrainSplit.timeSplit(fls, "ts_us", 0.8)
    val n = fls.count()
    val nTrain = train.count()
    assert(nTrain + test.count() == n)
    assert(math.abs(nTrain - 0.8 * n) <= 1)
    // no leakage: max train ts < min test ts
    import org.apache.spark.sql.functions.{max, min, col}
    val maxTrain = train.agg(max(col("ts_us"))).collect()(0).getLong(0)
    val minTest = test.agg(min(col("ts_us"))).collect()(0).getLong(0)
    assert(maxTrain < minTest)
  }
}
