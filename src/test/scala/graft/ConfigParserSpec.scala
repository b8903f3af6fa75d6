package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.core.ConfigParser
import graft.sources.SyntheticSine

class ConfigParserSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val json =
    """{"ts": "ts_us", "tie": "seq",
      | "features": [
      |   {"name": "volatility", "definition": "volatility",
      |    "deps": ["sine"],
      |    "params": {"value": "mid_price", "lookback": "1m"}}],
      | "label": {"source": "sine", "lookahead": "5s"}}""".stripMargin

  test("JSON config parses to the expected spec") {
    val cfg = ConfigParser.parse(json)
    assert(cfg.ts == "ts_us")
    assert(cfg.features.map(_.name) == Seq("volatility"))
    assert(cfg.features.head.params("lookback") == "1m")
    assert(cfg.labelSource.contains("sine"))
    assert(cfg.lookaheadUs.contains(5000000L))
  }

  test("config-built plan equals the hand-built flagship pipeline") {
    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 3600L * 1000000L, 1000000L,
        freq = 0.05)
      .select(col("ts_us"), col("seq"), col("mid_price"))
    val fromConfig = ConfigParser.buildPlan(ConfigParser.parse(json),
        Map("sine" -> src))
      .select(col("ts_us"), col("label_mid_price"), col("mid_price"),
        col("volatility_volatility").as("volatility"))
    val handBuilt = SparkEntry.entry(spark)
    assert(fromConfig.orderBy("ts_us").collect().toSeq ==
      handBuilt.orderBy("ts_us").collect().toSeq)
  }

  test("unknown definition and unknown dep fail clearly") {
    val bad = """{"features":[{"name":"x","definition":"nope","deps":[]}]}"""
    val e = intercept[IllegalArgumentException] {
      ConfigParser.buildPlan(ConfigParser.parse(bad), Map.empty)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("config without tie builds (seq defaults to ts)") {
    val noTie =
      """{"ts": "ts_us",
        | "features": [{"name": "vol", "definition": "volatility",
        |   "deps": ["sine"], "params": {"value": "mid_price", "lookback": "1m"}}]}""".stripMargin
    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 60000000L, 1000000L, freq = 0.05)
      .select(col("ts_us"), col("mid_price"))
    val out = ConfigParser.buildPlan(ConfigParser.parse(noTie), Map("sine" -> src))
    assert(out.count() == 60)
    assert(out.columns.contains("volatility"))
  }

  test("multiple features without a label is rejected, not silently truncated") {
    val two =
      """{"ts": "ts_us",
        | "features": [
        |  {"name": "a", "definition": "volatility", "deps": ["sine"],
        |   "params": {"value": "mid_price", "lookback": "1m"}},
        |  {"name": "b", "definition": "volatility", "deps": ["sine"],
        |   "params": {"value": "mid_price", "lookback": "2m"}}]}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      ConfigParser.buildPlan(ConfigParser.parse(two),
        Map("sine" -> spark.range(1).toDF()))
    }
    assert(e.getMessage.contains("label"))
  }
}
