package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, WindowOps}
import graft.queries._
import graft.sources.SyntheticSine

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled from the per-domain suites in
  * graft.queries: every entry is one operator of SURVEY.md §2 (or a
  * beyond-reference LLM-pipeline operator) with, where expressible, a
  * DuckDB oracle the driver hash-compares at sf0.01.
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ DocQueries.defs ++
      EmbeddingQueries.defs ++ StatefulQueries.defs ++ MultimodalQueries.defs

  /** Flagship query (reference README quick-start, SURVEY.md §7 stage 4):
    * synthetic sine mid-price → sliding volatility → point-in-time join →
    * 5s-lookahead label ⇒ FeatureLabelSet. Fully deterministic, no
    * external data; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in epoch micros
    val hour = 3600L * 1000000L
    val src = SyntheticSine(spark, t0, t0 + hour, 1000000L)
    val okey = WindowOps.orderKey(col("ts_us"), col("seq"))

    val base = src.select(col("ts_us"), col("seq"), col("mid_price"))
    val vol = src.select(col("ts_us"),
      WindowOps.volatility(col("mid_price"), Nil, okey, 60L * 1000000L)
        .as("volatility"))

    // Label first (reference tasks.py:242-252 column order), then align
    // the volatility feature on the labeled frame's timestamps.
    val labeled = AsofJoin.lookaheadShift(
      base, "ts_us", 5L * 1000000L, Nil, "label", tieBreak = Some("seq"))
    AsofJoin.pointInTimeJoin(labeled, Seq(("volatility", vol)), "ts_us")
      .select(col("ts_us"), col("label_mid_price"), col("mid_price"),
        col("volatility_volatility").as("volatility"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
