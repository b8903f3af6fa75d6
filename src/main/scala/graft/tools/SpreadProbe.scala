package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe: the single-row-group scan wall. Every sf table
  * ships as ONE parquet row group, so scan-stage work (tokenization,
  * signatures, typed maps, partial aggs) runs on one core no matter
  * the session's parallelism. Times representative expensive
  * scan-stage operators with and without a post-scan spread. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, dir)
    val spread = docs.repartition(spark.sparkContext.defaultParallelism)
    println(s"[probe] scan partitions: ${docs.rdd.getNumPartitions}")

    // warm both paths once
    (1 to 2).foreach { pass =>
      val tag = if (pass == 1) "warmup" else "timed"
      time(s"$tag minhashSignatures plain") {
        noop(Dedup.minhashSignatures(docs, col("text"), col("doc_id"),
          perms = 32, shingleN = 3, baseHash = Dedup.Md5Prefix))
      }
      time(s"$tag minhashSignatures spread") {
        noop(Dedup.minhashSignatures(spread, col("text"), col("doc_id"),
          perms = 32, shingleN = 3, baseHash = Dedup.Md5Prefix))
      }
      time(s"$tag explodeShingles+count plain") {
        noop(Dedup.explodeShingles(docs, col("text"), col("doc_id"), 3)
          .groupBy("s").count())
      }
      time(s"$tag explodeShingles+count spread") {
        noop(Dedup.explodeShingles(spread, col("text"), col("doc_id"), 3)
          .groupBy("s").count())
      }
      time(s"$tag simhash plain") {
        noop(Dedup.simhash(docs, col("text"), col("doc_id")))
      }
      time(s"$tag simhash spread") {
        noop(Dedup.simhash(spread, col("text"), col("doc_id")))
      }
      time(s"$tag wordCount-agg plain") {
        noop(docs.select(graft.operators.TextAnalysis.wordCount(col("text"))
          .as("n")).agg(sum("n")))
      }
      time(s"$tag wordCount-agg spread") {
        noop(spread.select(graft.operators.TextAnalysis.wordCount(col("text"))
          .as("n")).agg(sum("n")))
      }
    }
    spark.stop()
  }
}
