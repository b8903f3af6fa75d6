package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe (r17, verdict #6): per-round cost shape of
  * `connectedComponentsLargeStar` on the doc_dedup_clusters_ls chain
  * graph — rounds to convergence, wall per checkpointEvery setting
  * (lineage-truncation cadence), so the "is lineage growth paying
  * anything" question is measured instead of assumed. */
object CcRoundsProbe {
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    def pairs = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"))
      .withColumn("a_id", lag(col("doc_id"), 1).over(w))
      .filter(col("a_id").isNotNull)
      .select(col("a_id"), col("doc_id").as("b_id"))
    for (ck <- Seq(8, 4, 1000); rep <- 1 to 2) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.connectedComponentsLargeStar(
        pairs, checkpointEvery = ck)
      out.write.format("noop").mode("overwrite").save()
      println(f"[ccprobe] checkpointEvery=$ck rep=$rep rounds=" +
        f"${graft.operators.Dedup.lastRounds} wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
