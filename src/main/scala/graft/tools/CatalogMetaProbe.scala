package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Meta-log cost probe for the BlockCatalog round trip (r15 verdict
  * #7): `ev_catalog_scan` / `ev_catalog_timetravel` are the permanent
  * top of the slow board (5.8-6.3 s driver, flat sf1eq) but no
  * measurement separated the META-LOG machinery (mergeSchema parquet
  * read + collect per cache miss) from the data writes/scans. This
  * runs the graded query's exact shape — weekly writes, idempotency
  * re-checks, compaction, pruned range scan — with the r16
  * advance-on-append log cache ON vs OFF (the r15 invalidate
  * behavior), printing per-phase walls and the instrumented meta-read
  * (count, seconds) for each arm.
  *
  * Run: sbt "runMain graft.tools.CatalogMetaProbe [reps]"
  * (data from SPARK_GRAFT_SF_DIR, default sf0.1)
  */
object CatalogMetaProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("catalog-meta-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val e = graft.Tables.events(spark, dir)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] events rows = ${e.count()} ($dir)")
    val W = 7L * 86400000000L
    val weeks = e.select((col("ts_us") / W).cast("long").as("w"))
      .distinct().collect().map(_.getLong(0)).sorted
    def weekSlice(w: Long) = e.filter((col("ts_us") / W).cast("long") === w)
    val bounds = e.agg(min("ts_us"), max("ts_us")).collect()(0)
    val (t0us, t1us) = (bounds.getLong(0), bounds.getLong(1))

    def cycle(advance: Boolean): (Double, Double, Double, Long, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_meta_")
      graft.streaming.Streaming.sweepOnExit(root)
      val cat = new graft.sources.BlockCatalog(spark, root.toString)
      cat.advanceLogCache = advance
      cat.resetMetaReadStats()
      val s0 = System.nanoTime()
      weeks.foreach(w => cat.write(weekSlice(w), "events", "all", "ts_us"))
      weeks.take(2).foreach { w =>
        require(!cat.write(weekSlice(w), "events", "all", "ts_us"))
      }
      val s1 = System.nanoTime()
      cat.compactSmallBlocks("events", "all", targetRows = 1L << 60,
        tsUs = "ts_us")
      val s2 = System.nanoTime()
      val n = cat.scan("events", "all", t0us, t1us).count()
      val s3 = System.nanoTime()
      require(n == e.count(), s"scan lost rows: $n")
      val (mc, mn) = cat.metaReadStats
      (
        (s1 - s0) / 1e9, (s2 - s1) / 1e9, (s3 - s2) / 1e9,
        mc, mn / 1e9)
    }

    (1 to reps).foreach { r =>
      Seq(false, true).foreach { adv =>
        val (w, c, s, mc, ms) = cycle(adv)
        println(f"[probe] rep$r advance=$adv%-5s writes=$w%6.2f s  " +
          f"compact=$c%5.2f s  scan=$s%5.2f s  total=${w + c + s}%6.2f s  " +
          f"metaReads=$mc%3d ($ms%5.2f s)")
      }
    }
    spark.stop()
  }
}
