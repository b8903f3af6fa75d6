package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Join-form vs in-bucket-form decision probe for the TEXT SimHash
  * family (r12 verdict item 5).
  *
  * r12 measured that [[Dedup.simhashPairsBucketed]] (one exchange into
  * capped collect_list groups, pairs popcount-verified inside the
  * group) beats the band self-join on POPULATION-SKEWED hashes (dHash:
  * Markov-correlated bits, 15M-doc probe ENOSPC'd the join). The text
  * family (`doc_simhash`, radius 6, C(8,2)=28 bands) still uses the
  * join form. This probe decides the rule for text's own skew regime:
  *
  *   A. measure the REAL text-simhash population (sf0.1 documents,
  *      the library default xxhash64 base hash): per-bit marginal
  *      bias and the 28-band bucket-occupancy profile — text SimHash
  *      bits are weighted sums over token hashes, so unlike dHash
  *      they have no adjacent-bit Markov coupling, but stopword-
  *      dominated weights can still bias marginals;
  *   B. synthesize corpora at scale carrying the measured per-bit
  *      biases — one CLEAN regime (every doc unique: the join-once
  *      uniform-table shape) and one BOILERPLATE regime (20% of docs
  *      in 100-member template clusters, members 0..6 bit-flips from
  *      the template: the skew text exhibits at 100 TB) — and time
  *      BOTH forms at the text radius (6), same hot-bucket cap,
  *      asserting equal output counts.
  *
  * SimHash of the text is form-independent map work, so the probe
  * synthesizes signatures directly (the band machinery is the only
  * thing that differs between the forms) with the measured bit
  * statistics.
  *
  * Run: sbt "runMain graft.tools.SimhashSkewProbe 1000000,5000000"
  */
object SimhashSkewProbe {

  /** splitmix64 — deterministic per-(doc, bit) randomness. */
  private[tools] def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** A 64-bit signature with independent per-bit marginals `pQ32(i)`
    * (bias as a Q32 threshold), keyed by `key`. */
  private[tools] def biasedSig(key: Long, pQ32: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      val u = mix(key * 64 + i) >>> 32
      if (u < pQ32(i)) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "1000000,5000000")
      .split(",").map(_.trim.toLong)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // ---- Stage A: the real text-simhash population ----
    val real = Dedup.simhash(graft.Tables.documents(spark, sfDir),
      col("text"), col("doc_id")).persist()
    val nReal = real.count()
    val sigsReal = real.select("simhash").as[Long].collect()
    val bias = Array.tabulate(64) { i =>
      sigsReal.count(s => ((s >>> i) & 1L) == 1L).toDouble / nReal
    }
    val maxBias = bias.map(p => math.abs(p - 0.5)).max
    println(f"[probe] real corpus: $nReal%d docs, per-bit marginal " +
      f"|p-0.5| max=$maxBias%.3f mean=${bias.map(p => math.abs(p - 0.5)).sum / 64}%.3f")
    val prof = Dedup.simhashChunks(real, maxDist = 6)
      .groupBy("cidx", "cval").agg(count(lit(1)).as("b"))
      .select(max(col("b")), avg(col("b")), count(lit(1)))
      .as[(Long, Double, Long)].head()
    println(f"[probe] real 28-band profile: ${prof._3}%d buckets, " +
      f"max occupancy ${prof._1}%d, mean ${prof._2}%.2f")
    real.unpersist()

    // ---- Stage A': the MINHASH band population on the same corpus —
    // decides whether the minhash incremental leg needs the cap the
    // chunk-band legs got in r13. MinHash band keys are xxhash64 over
    // r row-mins (a 64-bit keyspace), so unlike 16-bit chunk values
    // they cannot be population-skewed by biased BITS; only true
    // replica/near-replica groups (identical shingle sets) collide.
    val mhSigs = Dedup.minhashSignatures(
      graft.Tables.documents(spark, sfDir), col("text"), col("doc_id"),
      perms = 32, shingleN = 3)
    val mprof = Dedup.minhashBands(mhSigs, perms = 32, bands = 16)
      .groupBy("bidx", "bhash").agg(count(lit(1)).as("b"))
      .select(max(col("b")), avg(col("b")), count(lit(1)))
      .as[(Long, Double, Long)].head()
    println(f"[probe] real minhash 16-band profile: ${mprof._3}%d buckets, " +
      f"max occupancy ${mprof._1}%d, mean ${mprof._2}%.2f")

    // carry the measured biases into the synthetic population
    val pQ32 = bias.map(p => (p * (1L << 32)).toLong)

    val cap = Dedup.SimhashHotBucketCap
    for (n <- sizes; boiler <- Seq(false, true)) {
      val regime = if (boiler) "boilerplate20%xg100" else "clean"
      val nBoiler = if (boiler) n / 5 else 0L
      val sigs = spark.range(n).as[Long].map { id =>
        val sig =
          if (id < nBoiler) {
            // template clusters of 100: base signature keyed by the
            // cluster (disjoint keyspace via the sign bit), members
            // id%7 = 0..6 deterministic bit flips away
            val cluster = id / 100
            var s = biasedSig(-cluster - 1, pQ32)
            val k = (id % 7).toInt
            var j = 0
            while (j < k) {
              s ^= 1L << ((mix(id * 8 + j) >>> 58).toInt) // 0..63
              j += 1
            }
            s
          } else biasedSig(id, pQ32)
        (id, sig)
      }.toDF("doc_id", "simhash")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sigs.count()

      // arithmetic candidate volume (never materialized): per bucket
      // of size B, both forms verify C(min(B, cap), 2) candidates
      val vol = Dedup.simhashChunks(sigs, maxDist = 6)
        .groupBy(col("cidx"), col("cval")).agg(count(lit(1)).as("b"))
        .select(
          sum(expr(s"least(b, $cap) * (least(b, $cap) - 1) div 2")).as("pairs"),
          max(col("b")).as("maxb"), count(lit(1)).as("buckets"))
        .as[(Long, Long, Long)].head()
      println(f"[probe] n=$n%d $regime%s: ${vol._3}%d buckets, max ${vol._2}%d, " +
        f"candidate volume ${vol._1}%d")

      val tB0 = System.nanoTime()
      val cntB = Dedup.simhashPairsBucketed(sigs, maxDist = 6,
        maxBucket = cap).count()
      val tB = (System.nanoTime() - tB0) / 1e9
      val tJ0 = System.nanoTime()
      val cntJ = Dedup.simhashPairs(sigs, maxDist = 6,
        maxBucket = cap).count()
      val tJ = (System.nanoTime() - tJ0) / 1e9
      require(cntB == cntJ, s"form outputs differ: bucketed=$cntB join=$cntJ")
      println(f"[probe] n=$n%d $regime%s: pairs=$cntB%d  " +
        f"bucketed=$tB%.1f s  join=$tJ%.1f s  join/bucketed=${tJ / tB}%.2f")
      sigs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
