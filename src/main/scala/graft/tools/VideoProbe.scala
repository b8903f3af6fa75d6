package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Stage dissection for mm_video_dups (slowest board query after it
  * landed): where do the seconds go — keyframe flatMap, band mining,
  * or rollup? */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // the SINGLE-SOURCED mm_video_dups extraction rule
    val keyframeHashes = graft.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .flatMap(id => graft.queries.MultimodalQueries.videoKeyframeHashes(id))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    time("flatMap count (populates cache)") { keyframeHashes.count() }
    time("flatMap count again (cache read)") { keyframeHashes.count() }
    val pairs = Dedup.simhashPairsBucketed(keyframeHashes, maxDist = 3,
      maxBucket = 1024)
    val n1 = time("pairs count (cached input)") { pairs.count() }
    println(s"[vp] pairs: $n1")
    val rolled = pairs
      .select(expr("a_id div 16").as("a_vid"), expr("b_id div 16").as("b_vid"),
        col("hamming"))
      .filter(col("a_vid") =!= col("b_vid"))
      .groupBy(col("a_vid").as("a_id"), col("b_vid").as("b_id"))
      .agg(count(lit(1)).cast("long").as("matches"),
        min(col("hamming")).cast("long").as("min_hamming"))
      .filter(col("matches") >= 2)
    time("rollup") { rolled.count() }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    time("cold end-to-end") {
      graft.queries.MultimodalQueries.defs("mm_video_dups")
        .build(spark, dir).count()
    }
    spark.stop()
  }
}
