package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Corpus-scale probe for the audio-fingerprint near-dup rung — the
  * mm_audio_dups shape at 300x the bench corpus (the image pHash
  * probe's discipline: same hash, same banding, wall-clock per stage).
  *
  * The synth formula reduces keys mod 32768, so a 15M-doc corpus has
  * ~458 exact-replica docs per distinct clip — the REPLICA-DOMINATED
  * regime. Unlike the image probe's corpus (256 content groups, whose
  * hot band buckets the 1024 cap subsamples), the audio corpus's
  * ~131k buckets sit BELOW the cap (~458 rows each), so naive mining's
  * emitted-pair volume is genuinely quadratic in replica depth:
  * sum-over-buckets C(bucket, 2) ~ 1.4e10 rows — hundreds of GB into
  * the distinct exchange, the ENOSPC shape. The cap guard cannot help
  * because no bucket is individually hot; the REPLICAS are the
  * problem, and the production answer is the one SCALE.md already
  * prescribes for kNN: DEDUP FIRST. This probe MEASURES that
  * sequencing end-to-end:
  *
  *   1. fingerprint throughput at full n (the new per-row cost:
  *      synth + RIFF encode + REAL decode + 65-block energy hash);
  *   2. the naive emitted-pair volume, computed ARITHMETICALLY from
  *      band-bucket sizes (never materialized);
  *   3. exact dedup on the fingerprint (min doc_id per hash — the
  *      Dedup.exactDedup shape with the hash as digest);
  *   4. banded near-dup mining over the SURVIVORS (output-sized).
  *
  * Run: sbt "runMain graft.tools.AudioScaleProbe 15000000"
  */
object AudioScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 15000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // the SINGLE-SOURCED mm_audio_dups corpus rule — the probe can
    // never measure a stale shape
    val hashes = spark.range(n).as[Long]
      .map(id => (id, graft.queries.MultimodalQueries.audioFingerprintOf(id)))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val t0 = System.nanoTime()
    val nh = hashes.count()
    val tHash = (System.nanoTime() - t0) / 1e9
    println(f"[probe] fingerprints: $nh%d docs in $tHash%.1f s " +
      f"(${nh / tHash}%.0f docs/s synth+encode+decode+hash)")

    // naive volume, arithmetically: per band bucket of size B the
    // in-bucket verify emits C(min(B, cap), 2) candidate popcounts and
    // (here, replicas) nearly that many verified rows into distinct
    val cap = 1024L
    val vol = Dedup.simhashChunks(hashes, maxDist = 3)
      .groupBy(col("cidx"), col("cval")).agg(count(lit(1)).as("b"))
      .select(
        sum(expr(s"least(b, $cap) * (least(b, $cap) - 1) div 2")).as("pairs"),
        count(lit(1)).as("buckets"), max(col("b")).as("maxb"))
      .as[(Long, Long, Long)].head()
    println(f"[probe] naive mining volume: ${vol._1}%d in-bucket pairs over " +
      f"${vol._2}%d buckets (max bucket ${vol._3}%d, cap $cap%d) — NOT run")

    // production sequencing: exact dedup on the fingerprint first
    val t1 = System.nanoTime()
    val survivors = hashes.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("replicas"))
    val (nsurv, maxRep) = survivors.select(count(lit(1)), max(col("replicas")))
      .as[(Long, Long)].head()
    val tDedup = (System.nanoTime() - t1) / 1e9
    println(f"[probe] exact dedup: $nsurv%d distinct fingerprints " +
      f"(deepest replica group $maxRep%d) in $tDedup%.1f s")

    val t2 = System.nanoTime()
    val pairs = Dedup.simhashPairsBucketed(
      survivors.select(col("doc_id"), col("simhash")),
      maxDist = 3, maxBucket = 1024)
    val np = pairs.count()
    val tPairs = (System.nanoTime() - t2) / 1e9
    println(f"[probe] near-dup over survivors: $np%d pairs in $tPairs%.1f s")
    println(f"[probe] total ${tHash + tDedup + tPairs}%.1f s for $n%d docs " +
      "(dedup-first sequencing)")
    spark.stop()
  }
}
