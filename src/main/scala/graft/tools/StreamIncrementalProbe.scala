package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Corpus-scale probe for the STREAMING-vs-persistent-index
  * composition (Streaming.hashDedupIncrementalStream /
  * mm_phash_incremental_stream): the IncrementalScaleProbe population
  * (15M-doc skew-modeled index, 1M-doc batch, 1-in-5 planted
  * near-dups, radius 3) with the batch now ARRIVING as a stream in
  * four 250k-doc triggers — cross-trigger fMGWS band state at real
  * volume, each trigger's foreachBatch fold joining the stored
  * bucketed index.
  *
  * Measures the batch verdict (the reference), then the streaming
  * drain wall, and REQUIRES the two verdict censuses to be identical
  * — "the arrival engine must not change one verdict" graded at 15M,
  * not just at sf0.01.
  *
  * Run: sbt "runMain graft.tools.StreamIncrementalProbe 15000000 1000000 4"
  */
object StreamIncrementalProbe {
  def main(args: Array[String]): Unit = {
    val nIdx = if (args.length > 0) args(0).toLong else 15000000L
    val nBatch = if (args.length > 1) args(1).toLong else 1000000L
    val triggers = if (args.length > 2) args(2).toInt else 4
    // 5th arg "memstore" keeps the default in-memory state store —
    // the r14 store-choice A/B (SCALE.md); anything else = RocksDB
    val memStore = args.length > 4 && args(4) == "memstore"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_sincprobe_wh")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    if (!memStore) spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val real = Dedup.simhash(
      graft.Tables.documents(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
      col("text"), col("doc_id")).select("simhash").as[Long].collect()
    val pQ32 = Array.tabulate(64) { i =>
      ((real.count(s => ((s >>> i) & 1L) == 1L).toDouble / real.length)
        * (1L << 32)).toLong
    }
    def batchSigOf(j: Long): Long = {
      val id = nIdx + j
      if (j % 5 == 0) {
        var s = SimhashSkewProbe.biasedSig((j * 13) % nIdx, pQ32)
        val k = (j % 4).toInt
        var q = 0
        while (q < k) {
          s ^= 1L << ((SimhashSkewProbe.mix(id * 8 + q) >>> 58).toInt)
          q += 1
        }
        s
      } else SimhashSkewProbe.biasedSig(id, pQ32)
    }

    val idx = spark.range(nIdx).as[Long]
      .map(id => (id, SimhashSkewProbe.biasedSig(id, pQ32)))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = spark.range(nBatch).as[Long]
      .map(j => (nIdx + j, batchSigOf(j)))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] index=${idx.count()} batch=${batch.count()}")

    // the stored index (the production posture; write cost measured
    // by IncrementalScaleProbe — here it is setup)
    graft.sources.BucketedStore.write(
      Dedup.simhashChunks(idx, maxDist = 3), "graft_probe_sinc_idx",
      "/tmp/graft_sincprobe_idx", Seq("cidx", "cval"), buckets = 32)
    // "prefrag" (r16): simulate N prior daily ingests BEFORE the drain
    // — each append adds one file per touched bucket per write task
    // (the measured file-count wall, SCALE.md r15), so the drain
    // starts against a fragmented index; pair with "compact" to
    // measure the IN-LOOP recovery (compactIfFragmented after each
    // trigger's append, the hashDedupMaintStream cadence knob).
    val prefrag = args.find(_.startsWith("prefrag")).map(a =>
      if (a.contains("=")) a.split("=")(1).toInt else 10).getOrElse(0)
    if (prefrag > 0) {
      val t = System.nanoTime()
      (1 to prefrag).foreach { i =>
        val day = spark.range(1000000L).as[Long]
          .map(j => (nIdx + nBatch + i * 10000000L + j,
            SimhashSkewProbe.biasedSig(nIdx + nBatch + i * 10000000L + j,
              pQ32)))
          .toDF("doc_id", "simhash")
        graft.sources.BucketedStore.append(
          Dedup.simhashChunks(day, maxDist = 3), "graft_probe_sinc_idx")
      }
      println(f"[probe] prefrag: $prefrag appends in " +
        f"${(System.nanoTime() - t) / 1e9}%.1f s, files = " +
        graft.sources.BucketedStore.dataFileCount(spark,
          "graft_probe_sinc_idx"))
    }
    val stored = graft.sources.BucketedStore.read(spark, "graft_probe_sinc_idx")

    // reference: the batch operator against the same stored index
    val t0 = System.nanoTime()
    val vb = Dedup.incrementalNearDupHashes(batch,
        Seq.empty[(Long, Long)].toDF("doc_id", "simhash"), maxDist = 3,
        indexChunks = Some(stored))
      .groupBy("dup_of_index", "dup_of_batch_earlier", "keep")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        r.getLong(3)).toMap
    val tBatch = (System.nanoTime() - t0) / 1e9
    println(f"[probe] batch verdict (stored index): $tBatch%.1f s  " +
      vb.toSeq.sortBy(_._1.toString).map { case (k, n) => s"$k=$n" }
        .mkString("  "))

    // the stream: same 1M arrivals in `triggers` chunks, id order
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, Long)](numPartitions = 32)
    val counts = new java.util.concurrent.ConcurrentHashMap[
      (Boolean, Boolean, Boolean), Long]()
    var nTrig = 0
    val t1 = System.nanoTime()
    val q = graft.streaming.Streaming
      .hashDedupIncrementalVerdicts(input.toDS(), maxDist = 3,
        watermarkDelayMs = 365L * 24 * 3600 * 1000)
      .toDF("docId", "tsUs", "bidx", "matchedId", "sig")
      .writeStream.outputMode("append")
      .foreachBatch { (b0: org.apache.spark.sql.DataFrame, _: Long) =>
        // "persist" (r15 A/B): the fold consumes the micro-batch
        // TWICE (dupBatch agg + the index-join leg) and maint a third
        // time (keepers) — each consumption re-runs the fMGWS state
        // pass; one persist trades that for a materialization
        val doPersist = args.contains("persist")
        val b = if (doPersist) b0.persist() else b0
        // "maint" (r15): the hashDedupMaintStream discipline at probe
        // scale — fold against the table's CURRENT files, freeze,
        // append this trigger's keepers' chunks before the next one
        val maint = args.contains("maint")
        val idxFrame =
          if (maint)
            graft.sources.BucketedStore.read(spark, "graft_probe_sinc_idx")
          else stored
        val fold0 = graft.streaming.Streaming
          .incrementalBatchFold(b, idxFrame, maxDist = 3)
        val fold = if (maint) fold0.localCheckpoint() else fold0
        val rows = fold
          .groupBy("dup_of_index", "dup_of_batch_earlier", "keep")
          .agg(count(lit(1)).as("n")).collect()
        rows.foreach { r =>
          counts.merge((r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)),
            r.getLong(3), (a, bv) => a + bv)
        }
        if (maint) {
          val keepers = b
            .select(col("docId").as("doc_id"), col("sig").as("simhash"))
            .distinct()
            .join(fold.filter(col("keep")).select("doc_id"), Seq("doc_id"))
          graft.sources.BucketedStore.append(
            Dedup.simhashChunks(keepers, maxDist = 3),
            "graft_probe_sinc_idx")
          // "compact[=N]" (r16): the self-compacting cadence in-loop.
          // N is files-per-bucket; note ONE streaming append adds one
          // file per touched bucket PER WRITE TASK (~35/bucket here),
          // so N=10 fires a full rewrite EVERY trigger (measured 2x
          // SLOWER than staying fragmented at 4 triggers) — the r15
          // O(10) rule counts APPENDS, so at this cadence the
          // equivalent threshold is ~350: the drain recovers a
          // pre-fragmented index ONCE and amortizes over the
          // following ~10 triggers.
          val compactAt = args.find(_.startsWith("compact")).map(a =>
            if (a.contains("=")) a.split("=")(1).toInt else 10)
          compactAt.foreach { k =>
            val fired = graft.sources.BucketedStore.compactIfFragmented(
              spark, "graft_probe_sinc_idx", k)
            println(s"[probe]   trigger $nTrig compacted=${fired.isDefined} files=" +
              graft.sources.BucketedStore.dataFileCount(spark,
                "graft_probe_sinc_idx"))
          }
        }
        if (doPersist) b.unpersist()
        nTrig += 1
        ()
      }
      .start()
    val chunk = (nBatch / triggers).toInt
    var off = 0L
    while (off < nBatch) {
      val hi = math.min(nBatch, off + chunk)
      input.addData((off until hi).map(j =>
        (nIdx + j, (j + 1) * 1000000L, batchSigOf(j))))
      q.processAllAvailable()
      off = hi
    }
    q.stop()
    val tStream = (System.nanoTime() - t1) / 1e9
    import scala.jdk.CollectionConverters._
    val vs = counts.asScala.toMap
    println(f"[probe] stream drain: $tStream%.1f s over $nTrig triggers  " +
      vs.toSeq.sortBy(_._1.toString).map { case (k, n) => s"$k=$n" }
        .mkString("  "))
    def tot(m: Map[(Boolean, Boolean, Boolean), Long],
        f: ((Boolean, Boolean, Boolean)) => Boolean): Long =
      m.collect { case (k, n) if f(k) => n }.sum
    val strict = args.length > 3 && args(3) == "strict"
    if (strict) {
      // no-cap-trip config: the arrival engine must change NOTHING
      require(vs == vb,
        s"streaming verdict census differs from batch: $vs vs $vb")
      println("[probe] verdict censuses IDENTICAL (arrival engine changes nothing)")
    } else {
      // cap-tripping config: the engines diverge EXACTLY where the
      // md5-threshold cap's kept sample is bucket-size dependent —
      // the batch operator subsamples 1M-row bucket populations, the
      // stream's fMGWS state is exact (batch-earlier leg: stream must
      // find a SUPERSET) and its per-trigger index-join caps see
      // chunk-sized buckets (index leg: sample differs either way).
      val sbE = tot(vs, _._2); val bbE = tot(vb, _._2)
      val sIdx = tot(vs, _._1); val bIdx = tot(vb, _._1)
      require(sbE >= bbE,
        s"exact stream state found FEWER batch-earlier dups ($sbE < $bbE)")
      println(f"[probe] cap-tripping regime: batch-earlier dups stream=$sbE " +
        f"(exact state) vs batch=$bbE (md5-subsampled hot buckets, " +
        f"+${sbE - bbE} recall); dup_of_index stream=$sIdx vs batch=$bIdx " +
        f"(cap granularity: per-trigger vs whole-batch bucket sizes)")
    }
    spark.stop()
  }
}
