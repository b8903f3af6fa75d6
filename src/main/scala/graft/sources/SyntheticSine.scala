package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sine mid-price source (svoe
  * `synthetic_sine_mid_price.py:14-45`, S5):
  * `mid_price = amplitude * sin(2π * freq * t) + mean`, one row every
  * `stepUs` micros over [startUs, endUs). Generated distributed via
  * `spark.range` — at scale this parallelizes across executors with no
  * data movement.
  */
object SyntheticSine {
  def apply(
      spark: SparkSession,
      startUs: Long,
      endUs: Long,
      stepUs: Long,
      amplitude: Double = 2000.0,
      mean: Double = 10000.0,
      freq: Double = 5.0): DataFrame = {
    val n = Math.max(0L, (endUs - startUs) / stepUs)
    spark.range(n)
      .select(
        (lit(startUs) + col("id") * lit(stepUs)).as("ts_us"),
        col("id").as("seq"))
      .withColumn("t_sec", col("ts_us").cast("double") / lit(1e6))
      .withColumn("mid_price",
        lit(amplitude) * sin(lit(2.0 * Math.PI * freq) * col("t_sec")) + lit(mean))
      .withColumn("receipt_ts_us", col("ts_us"))
      .drop("t_sec")
  }
}
