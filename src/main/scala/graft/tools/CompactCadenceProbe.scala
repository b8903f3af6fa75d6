package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for the self-compacting maintenance drain's
  * in-loop costs (r16): what one [[graft.sources.BucketedStore
  * .compactBuckets]] / `append` / `dataFileCount` / `vacuumBuckets`
  * call costs at a given index size, isolated from the drain — the
  * denominator for choosing `compactAtFilesPerBucket` (the cadence
  * knob). Also drives the IN-LOOP recovery measurement: a staged
  * multi-trigger drain with compaction on vs off (SCALE.md r16 row).
  *
  * Run: sbt "runMain graft.tools.CompactCadenceProbe [nSigs] [appends]"
  */
object CompactCadenceProbe {
  def t[A](tag: String)(f: => A): A = {
    val s = System.nanoTime
    val r = f
    println(f"[probe] $tag%-30s ${(System.nanoTime - s) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val appends = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("compact-cadence-probe").getOrCreate()
    import spark.implicits._
    try {
      val sigs = spark.range(n).select(col("id").as("doc_id"),
        xxhash64(col("id")).as("simhash"))
      val chunks = graft.operators.Dedup.simhashChunks(sigs, 3)
        .localCheckpoint()
      val root = java.nio.file.Files.createTempDirectory("probe_cmp_")
      graft.streaming.Streaming.sweepOnExit(root)
      val B = 32
      t("write")(graft.sources.BucketedStore.write(chunks, "probe_cmp",
        root.resolve("idx").toString, Seq("cidx", "cval"), B))
      (1 to appends).foreach { i =>
        t(s"append$i")(graft.sources.BucketedStore.append(
          chunks.limit(1000), "probe_cmp"))
      }
      t("dataFileCount")(println("  files = " +
        graft.sources.BucketedStore.dataFileCount(spark, "probe_cmp")))
      t("compactIfFragmented(10)")(
        graft.sources.BucketedStore.compactIfFragmented(spark,
          "probe_cmp", 10))
      t("compact")(graft.sources.BucketedStore.compactBuckets(spark,
        "probe_cmp"))
      t("dataFileCount2")(println("  files = " +
        graft.sources.BucketedStore.dataFileCount(spark, "probe_cmp")))
      t("compact2")(graft.sources.BucketedStore.compactBuckets(spark,
        "probe_cmp"))
      t("vacuum")(println("  reclaimed = " +
        graft.sources.BucketedStore.vacuumBuckets(spark, "probe_cmp").size))
    } finally {
      spark.sql("DROP TABLE IF EXISTS probe_cmp")
      spark.stop()
    }
  }
}
