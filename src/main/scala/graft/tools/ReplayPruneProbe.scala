package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe: print the STREAMING physical plan of the
  * ev_replay_source_agg-shaped drain (StreamingQuery.explain after an
  * AvailableNow run) — the only place a DSv2 streaming scan's
  * ReadSchema is visible, since PlanDump sees just the post-drain batch
  * read. Evidence pair for the r17 column-pruning change:
  * GRAFT_REPLAY_PRUNE_DISABLE=true reproduces the pre-r17 builder. */
object ReplayPruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perBatch = math.max(2000L, graft.Tables.events(spark, dir).count() / 5L)
    val stream = spark.readStream
      .format("graft.sources.EventReplayProvider")
      .option("path", dir)
      .option("rowsPerBatch", perBatch)
      .options(
        // the before arm replays the pre-r17 full-width source
        if (sys.env.get("GRAFT_REPLAY_PRUNE_DISABLE").contains("true")) Map.empty[String, String]
        else Map("columns" -> "event_id,event_type,value"))
      .load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100)) / 100).as("sum_value"),
        max(col("event_id")).as("max_id"))
    val root = java.nio.file.Files.createTempDirectory("graft_prune_probe_")
    val out = root.resolve("out").toString
    val q = stream.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println("=== streaming physical plan (last batch) ===")
    q.explain()
    spark.stop()
  }
}
