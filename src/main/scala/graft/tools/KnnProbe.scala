package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** kNN-graph scale-evidence probe (SCALE.md round-9/10: the bits-growth
  * + recall + cap-pressure rows the unclamped autoBits(30) path owes).
  *
  * Per run, on SPARK_GRAFT_SF_DIR's embeddings table, reports ONE JSON
  * line with:
  *   - `bits`: the derived autoBits value (the claim under test: it
  *     must GROW past the old 16-bit ceiling once n > 2M);
  *   - `recall_ppm_mean`: graph recall@k vs exact cosine top-k on
  *     KNN_PROBE_ANCHORS sampled anchors (md5-prefix pick) at the fixed
  *     production KnnHotBucketCap — the "recall holds across the
  *     decade" row;
  *   - `capped_buckets` / `rows_in_capped`: hot buckets dropped from
  *     candidate generation, summed over tables (cap-pressure
  *     attribution for any recall movement);
  *   - `graph_s`: graph build + parquet materialization wall (NOT the
  *     Bench-comparable number — Bench PASSES=1 rows are the timing
  *     evidence; this one just bounds the probe's own cost).
  *
  * The graph is materialized to parquet once and recall reads it back,
  * so the evaluation never recomputes the (expensive) graph lineage.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.KnnProbe"
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val anchors = sys.env.getOrElse("KNN_PROBE_ANCHORS", "64").toInt
    val k = sys.env.getOrElse("KNN_PROBE_K", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val bits = Similarity.autoBits(n)
    // cap override for attribution sweeps (recall vs cap pressure on
    // the replica-heavy probe corpus); production stays KnnHotBucketCap
    val cap = sys.env.get("KNN_PROBE_CAP").map(_.toInt)
      .getOrElse(Similarity.KnnHotBucketCap)

    // cap pressure first (one exploded agg, no graph state retained)
    val capStats = Similarity.cappedBucketStats(emb, bits, dim = 64,
      maxBucket = cap).agg(
        coalesce(sum(col("capped_buckets")), lit(0L)),
        coalesce(sum(col("rows_in_capped")), lit(0L))).collect()(0)
    val cappedBuckets = capStats.getLong(0)
    val rowsInCapped = capStats.getLong(1)

    // graphless mode: the fifth-decade path — the full graph's
    // embedding-carrying shuffle exceeds the probe box's disk at 20M
    // vectors, but graphRecallAnchorsOnly reproduces the anchors' graph
    // rows exactly (spec-pinned) from a key-only size aggregate + a
    // broadcast bucket prune
    val graphless = sys.env.get("KNN_PROBE_GRAPHLESS").contains("1")
    var graphS = -1.0
    val recallDf =
      if (graphless) Similarity.graphRecallAnchorsOnly(emb, k, anchors,
        bits = bits, maxBucket = cap)
      else {
        val gpath = java.nio.file.Files.createTempDirectory("knn_probe").toString
        val t0 = System.nanoTime()
        Similarity.knnGraph(emb, k, bits = bits, dim = 64, maxBucket = cap)
          .write.mode("overwrite").parquet(s"$gpath/graph")
        graphS = (System.nanoTime() - t0) / 1e9
        Similarity.graphRecallSampled(emb,
          spark.read.parquet(s"$gpath/graph"), k, anchors)
      }
    val recall = recallDf
      .agg(avg(col("recall_ppm")), count(lit(1))).collect()(0)
    // avg over zero rows is NULL (empty/undersized embeddings table):
    // report n=0 instead of NPE-ing the probe
    val recallMean = if (recall.isNullAt(0)) 0.0 else recall.getDouble(0)
    val nAnchors = recall.getLong(1)

    println(f"""{"dir":"$dir","n":$n,"bits":$bits,"k":$k,"cap":$cap,""" +
      f""""anchors":$nAnchors,"recall_ppm_mean":$recallMean%.1f,""" +
      f""""capped_buckets":$cappedBuckets,"rows_in_capped":$rowsInCapped,""" +
      f""""graph_s":$graphS%.1f}""")
    spark.stop()
  }
}
