package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  * Each table is a single parquet file under `dir` (an sf directory such
  * as `/root/testdata/sf0.01`). At production scale these would be
  * day/key-partitioned parquet tables registered in the catalog
  * (SURVEY.md §1.3); the read path is identical — `spark.read.parquet`
  * with Catalyst handling partition pruning and filter pushdown.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table stores `ts` as parquet INT64 TIMESTAMP(NANOS),
    * which Spark cannot represent as TimestampType (micros). We read it
    * as an epoch-nanoseconds Long (`nanosAsLong`) and keep all event-time
    * arithmetic in exact integers — deterministic across engines (the
    * DuckDB oracle sees the same column truncated to micros;
    * `ts div 1000` here equals DuckDB `epoch_us(ts)`).
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
