package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Corpus-scale probe for the INCREMENTAL perceptual leg
  * (Dedup.incrementalNearDupHashes / mm_phash_incremental): a 15M-doc
  * accumulated index meets a 1M-doc ingest batch at the perceptual
  * radius (3, 4 disjoint-pair bands).
  *
  * Population: the SimhashSkewProbe bias model (per-bit marginals
  * measured from the real corpus), so band values are SKEWED the way
  * production hashes are. One batch doc in five is a planted near-dup
  * of an index doc (0-3 flips), the rest fresh.
  *
  * Measures:
  *   1. the UNCAPPED join's candidate volume, arithmetically (sum
  *      over band values of index-bucket x batch-bucket — never run);
  *   2. the capped verdict end-to-end (default SimhashHotBucketCap);
  *   3. the same verdict against a BucketedStore-stored band index
  *      (write cost reported separately) — the production shape where
  *      the index never recomputes its chunks.
  *
  * Run: sbt "runMain graft.tools.IncrementalScaleProbe 15000000 1000000"
  *      args(2): "compact" (adds step 5, appends+compactBuckets) or
  *      "uniform" (UNBIASED 64-bit sigs instead of the corpus-skew
  *      model — the r15 prefilter's documented opt-in regime, where
  *      rows spread evenly over band slots and value pruning can
  *      actually bite; measures the claim instead of asserting it)
  */
object IncrementalScaleProbe {
  def main(args: Array[String]): Unit = {
    val nIdx = if (args.length > 0) args(0).toLong else 15000000L
    val nBatch = if (args.length > 1) args(1).toLong else 1000000L
    val uniform = args.length > 2 && args(2) == "uniform"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_incprobe_wh")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // the bias the real corpus measured (SimhashSkewProbe stage A
    // re-derived here so the probe is self-contained)
    val real = Dedup.simhash(
      graft.Tables.documents(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
      col("text"), col("doc_id")).select("simhash").as[Long].collect()
    val pQ32 = Array.tabulate(64) { i =>
      ((real.count(s => ((s >>> i) & 1L) == 1L).toDouble / real.length)
        * (1L << 32)).toLong
    }

    def baseSig(id: Long): Long =
      if (uniform) SimhashSkewProbe.mix(id) else
        SimhashSkewProbe.biasedSig(id, pQ32)
    val idx = spark.range(nIdx).as[Long]
      .map(id => (id, baseSig(id)))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = spark.range(nBatch).as[Long]
      .map { j =>
        val id = nIdx + j
        val sig =
          if (j % 5 == 0) {
            // planted near-dup of an index doc: 0-3 flips
            var s = baseSig((j * 13) % nIdx)
            val k = (j % 4).toInt
            var q = 0
            while (q < k) {
              s ^= 1L << ((SimhashSkewProbe.mix(id * 8 + q) >>> 58).toInt)
              q += 1
            }
            s
          } else baseSig(id)
        (id, sig)
      }.toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] index=${idx.count()} batch=${batch.count()}")

    // 1. uncapped candidate volume, arithmetically: per band value,
    //    index-bucket x batch-bucket
    val iCnt = Dedup.simhashChunks(idx, maxDist = 3)
      .groupBy("cidx", "cval").agg(count(lit(1)).as("ib"))
    val bCnt = Dedup.simhashChunks(batch, maxDist = 3)
      .groupBy("cidx", "cval").agg(count(lit(1)).as("bb"))
    val vol = iCnt.join(bCnt, Seq("cidx", "cval"))
      .select(sum(col("ib") * col("bb")).as("cand"),
        max(col("ib")).as("maxi"), max(col("bb")).as("maxb"))
      .as[(Long, Long, Long)].head()
    println(f"[probe] UNCAPPED index-join candidates: ${vol._1}%d " +
      f"(hottest index bucket ${vol._2}%d, hottest batch bucket ${vol._3}%d) — NOT run")

    // 2. capped verdict, chunks computed on the fly
    val t0 = System.nanoTime()
    val v = Dedup.incrementalNearDupHashes(batch, idx, maxDist = 3)
      .groupBy("dup_of_index", "dup_of_batch_earlier", "keep")
      .agg(count(lit(1)).as("n")).collect()
    val tDirect = (System.nanoTime() - t0) / 1e9
    println(f"[probe] capped verdict (direct): $tDirect%.1f s  " +
      v.map(r => s"${r.get(0)}/${r.get(1)}/${r.get(2)}=${r.get(3)}")
        .mkString("  "))

    // 3. the production shape: band index stored bucketed on its keys
    val t1 = System.nanoTime()
    graft.sources.BucketedStore.write(
      Dedup.simhashChunks(idx, maxDist = 3), "graft_probe_inc_idx",
      "/tmp/graft_incprobe_idx", Seq("cidx", "cval"), buckets = 32)
    val tWrite = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val emptySigs = Seq.empty[(Long, Long)].toDF("doc_id", "simhash")
    val v2 = Dedup.incrementalNearDupHashes(batch, emptySigs, maxDist = 3,
        indexChunks = Some(
          graft.sources.BucketedStore.read(spark, "graft_probe_inc_idx")))
      .groupBy("dup_of_index", "dup_of_batch_earlier", "keep")
      .agg(count(lit(1)).as("n")).collect()
    val tStored = (System.nanoTime() - t2) / 1e9
    require(v.map(_.toSeq).toSet == v2.map(_.toSeq).toSet,
      "stored-index verdict differs from direct")
    println(f"[probe] band-index store write: $tWrite%.1f s; " +
      f"capped verdict (stored index): $tStored%.1f s")

    // 4. INDEX-SIDE PREFILTER A/B (r15, the r14 amortization decade's
    //    named lever): the broadcast left-semi keeps only index band
    //    rows whose (cidx, cval) the batch touches. Selectivity first
    //    (what fraction of the stored index can the verdict join even
    //    see), then alternated off/on wall times (host drift makes
    //    single reads unreadable — the r14 alternation discipline).
    val stored = graft.sources.BucketedStore.read(spark, "graft_probe_inc_idx")
    val bKeys = Dedup.simhashChunks(batch, maxDist = 3)
      .select("cidx", "cval").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKeys = bKeys.count()
    val idxRows = stored.count()
    val surviving = stored.join(broadcast(bKeys), Seq("cidx", "cval"),
      "left_semi").count()
    println(f"[probe] prefilter selectivity: batch touches $nKeys%d of " +
      f"${4 * 65536}%d band slots; surviving index rows $surviving%d of " +
      f"$idxRows%d (${100.0 * surviving / idxRows}%.1f%%)")
    def storedVerdict(pf: Boolean): (Double, Set[Seq[Any]]) = {
      val t = System.nanoTime()
      val r = Dedup.incrementalNearDupHashes(batch, emptySigs, maxDist = 3,
          indexChunks = Some(
            graft.sources.BucketedStore.read(spark, "graft_probe_inc_idx")),
          indexPrefilter = pf)
        .groupBy("dup_of_index", "dup_of_batch_earlier", "keep")
        .agg(count(lit(1)).as("n")).collect()
      ((System.nanoTime() - t) / 1e9, r.map(_.toSeq).toSet)
    }
    val (offA, cOffA) = storedVerdict(false)
    val (onA, cOnA) = storedVerdict(true)
    val (offB, _) = storedVerdict(false)
    val (onB, _) = storedVerdict(true)
    require(cOffA == v.map(_.toSeq).toSet && cOnA == cOffA,
      "prefilter changed verdicts")
    println(f"[probe] stored verdict alternation: prefilter OFF " +
      f"$offA%.1f / $offB%.1f s, ON $onA%.1f / $onB%.1f s " +
      f"(verdicts identical all four)")

    // 5. file-count growth + compactBuckets recovery (r15 verdict #5):
    //    N simulated daily ingests append one file per touched bucket
    //    each; measure the fragmented stored verdict, compact to one
    //    file per bucket, measure again — same rows, same verdicts,
    //    file count collapsed. Opt-in: probe ... compact [nAppends]
    if (args.length > 2 && args(2) == "compact") {
      val nApp = if (args.length > 3) args(3).toInt else 10
      var k = 0
      while (k < nApp) {
        // distinct doc ids per simulated day (same sig population —
        // content of the rows is irrelevant to scan/file cost)
        graft.sources.BucketedStore.append(
          Dedup.simhashChunks(batch.select(
            (col("doc_id") + lit((k + 1) * 1000000000L)).as("doc_id"),
            col("simhash")), maxDist = 3),
          "graft_probe_inc_idx")
        k += 1
      }
      def nFiles(): Int = {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(
              "graft_probe_inc_idx")).location)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(loc).count(s => s.getPath.getName.startsWith("part-"))
      }
      val fFrag = nFiles()
      val (tFrag1, cFrag) = storedVerdict(true)
      val (tFrag2, _) = storedVerdict(true)
      val tc = System.nanoTime()
      graft.sources.BucketedStore.compactBuckets(spark, "graft_probe_inc_idx")
      val tCompact = (System.nanoTime() - tc) / 1e9
      val fComp = nFiles()
      val (tComp1, cComp) = storedVerdict(true)
      val (tComp2, _) = storedVerdict(true)
      require(cComp == cFrag, "compaction changed verdicts")
      println(f"[probe] compact recovery: $nApp appends -> $fFrag%d files, " +
        f"verdict $tFrag1%.1f / $tFrag2%.1f s; compact ($tCompact%.1f s) -> " +
        f"$fComp%d files, verdict $tComp1%.1f / $tComp2%.1f s " +
        f"(verdicts identical)")
    }
    spark.stop()
  }
}
