package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Corpus-scale probe for the audio-fingerprint near-dup rung — the
  * mm_audio_dups shape at 300x the bench corpus (the image pHash
  * probe's discipline: same query, same knobs, wall-clock per stage).
  * Per doc: synthesize the 1300-sample even clip (gain-halved odd
  * twins, one perturbed block per 5th gid), REAL-encode to RIFF/WAVE,
  * REAL-decode, fingerprint, then mine pairs with the 4-band
  * disjoint-pair tier + capped in-bucket verify.
  *
  * Like the kNN probes this is a REPLICA corpus by construction: the
  * sample formula reduces keys mod 32768, so at 15M docs every
  * fingerprint has ~458 exact replicas — the hot-bucket regime the cap
  * guard exists for. The run therefore measures BOTH the decode map's
  * throughput and the cap's behavior under full saturation.
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

    val clipLen = 1300
    val hashes = spark.range(n).as[Long]
      .map { id =>
        val gid = id / 2
        val raw = Array.tabulate(clipLen)(i =>
          Multimodal.synthSampleEven(gid, i.toLong))
        val base = if (id % 2 == 1) raw.map(_ >> 1) else raw
        val clip =
          if (id % 2 == 1 && gid % 5 == 0) {
            val b = (1 + gid % 63).toInt
            val lo = b * clipLen / 65
            val hi = (b + 1) * clipLen / 65
            Array.tabulate(clipLen)(i =>
              if (i >= lo && i < hi) base(i) + 4000 else base(i))
          } else base
        val dec = Multimodal.decodeWav(Multimodal.encodeWav(clip, 8000))
        (id, Multimodal.audioFingerprint64(dec.samples))
      }.toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val t0 = System.nanoTime()
    val nh = hashes.count()
    val tHash = (System.nanoTime() - t0) / 1e9
    println(f"[probe] fingerprints: $nh%d docs in $tHash%.1f s " +
      f"(${nh / tHash}%.0f docs/s synth+encode+decode+hash)")

    val t1 = System.nanoTime()
    val pairs = Dedup.simhashPairsBucketed(hashes, maxDist = 3,
      maxBucket = 1024)
    val np = pairs.count()
    val tPairs = (System.nanoTime() - t1) / 1e9
    println(f"[probe] pairs: $np%d in $tPairs%.1f s (cap 1024, 4 disjoint bands)")
    println(f"[probe] total ${tHash + tPairs}%.1f s for $n%d docs")
    spark.stop()
  }
}
