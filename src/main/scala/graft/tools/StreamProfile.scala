package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe (never driver-run): replicate one streaming
  * drain with the SAME session shape as Bench and print every
  * micro-batch's progress JSON — durationMs breakdown (addBatch,
  * getBatch, walCommit, commitOffsets, queryPlanning, triggerExecution)
  * and state-operator metrics. The measurement §7.1 asks for, drain
  * edition: WHERE each trigger's wall goes before touching anything. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "replay"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUF", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val df = which match {
      case "replay" =>
        val perBatch = math.max(2000L, graft.Tables.events(spark, dir).count() / 5L)
        spark.readStream
          .format("graft.sources.EventReplayProvider")
          .option("path", dir)
          .option("rowsPerBatch", perBatch)
          .load()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 100)) / 100).as("sum_value"),
            max(col("event_id")).as("max_id"))
      case "interval" =>
        val ev = graft.streaming.Streaming.eventsStream(spark, dir)
          .withColumn("ts_us", expr("ts div 1000"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("ts_us"), col("value").as("p_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            col("ts_us"), col("value").as("c_value"))
        graft.streaming.Streaming.intervalJoinStream(purchases, clicks,
          "user_id", "ts_us", 21600000000L, "12 hours")
      case other => sys.error(s"unknown probe $other")
    }
    val mode = if (which == "replay") "complete" else "append"

    // optional: exercise the drain-conf the runAvailableNow wrapper sets
    if (sys.env.get("SPARK_GRAFT_NODATA").contains("false"))
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // inline replica of runAvailableNowInner, keeping the query handle
    val root = sys.env.get("SPARK_GRAFT_CKPT_BASE") match {
      case Some(b) => java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(b), "graft_profile_")
      case None => java.nio.file.Files.createTempDirectory("graft_profile_")
    }
    val out = root.resolve("out").toString
    val saveMode = if (mode == "complete") "overwrite" else "append"
    val q = df.writeStream.outputMode(mode)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode(saveMode).parquet(out)
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"=== drain wall (incl session-reuse build): $wall s")
    q.recentProgress.foreach(p => println(p.json))
    spark.stop()
  }
}
