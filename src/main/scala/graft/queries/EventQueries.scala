package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsofJoin, WindowOps}
import graft.streaming.Streaming

/** The reference's feature-operator inventory (SURVEY.md §2.2–2.6)
  * exercised over the `events` table, which stands in for the trades/
  * ticker stream (FIXTURES.md §4): `user_id` plays the instrument key,
  * `value` the price/notional, `event_type` the side/channel.
  *
  * All event-time math is exact integer epoch-micros (`ts div 1000` of
  * the raw epoch-nanos Long == DuckDB `epoch_us(ts)`); ordering uses the
  * total order key `ts_us*1000 + event_id % 1000` so window frames and
  * arg_min/arg_max winners are identical across engines.
  */
object EventQueries {

  private val H   = 3600000000L           // 1h in us
  private val D   = 24 * H                // 24h in us
  private val M10 = 600000000L            // 10m in us
  // Slice bounds (events span Jan 2024): Jan 10 / Jan 20 midnight UTC.
  private val T10 = 1704844800000000L
  private val T20 = 1705708800000000L

  private val OKEY = "(epoch_us(ts)*1000 + event_id % 1000)"

  /** A1 OHLCV oracle — single-sourced for the batch query and its
    * streaming twin (ev_ohlcv_1h / ev_ohlcv_stream). */
  private lazy val OHLCV_SQL =
    s"""SELECT event_type,
       |  (epoch_us(ts) // ${H}) * ${H} AS bucket_us,
       |  arg_min(value, $OKEY) AS open,
       |  max(value) AS high,
       |  min(value) AS low,
       |  arg_max(value, $OKEY) AS close,
       |  sum(round(value*100))/100 AS volume,
       |  (sum(round(value*100)*round(value*100))
       |    / NULLIF(sum(round(value*100)), 0))/100 AS vwap,
       |  count(*) AS num_trades
       |FROM events
       |GROUP BY event_type, bucket_us""".stripMargin

  /** EXACT anomaly-flag oracle — single-sourced for the batch fold
    * query and its streaming twin (ev_anomaly_exact /
    * ev_anomaly_stream): the pure-integer z-score rule over the 24h
    * sliding stats, no float anywhere near the comparison. */
  private lazy val ANOMALY_SQL =
    s"""SELECT event_id, event_type, n,
       |  CASE WHEN (n*c - s)*(n*c - s) > 9*(n*ss - s*s)
       |    THEN 1 ELSE 0 END AS is_anomaly
       |FROM (
       |  SELECT event_id, event_type, c,
       |    CAST(count(*) OVER w AS BIGINT) AS n,
       |    CAST(sum(c) OVER w AS BIGINT) AS s,
       |    CAST(sum(c*c) OVER w AS BIGINT) AS ss
       |  FROM (SELECT event_id, event_type, ts,
       |      CAST(round(value*100) AS BIGINT) AS c FROM events) b
       |  WINDOW w AS (PARTITION BY event_type ORDER BY $OKEY
       |    RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW)) t""".stripMargin

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))

  private def okey: Column = WindowOps.orderKey(col("ts_us"), col("event_id"))

  /** Exact cents column: integer-valued double, order-independent sums. */
  private def cents(c: Column): Column = round(c * 100)

  val defs: Map[String, QueryDef] = Map(

    // P9 time-range slice — filter pushed to the parquet scan (bounds
    // are on the raw INT64 ns column, so row groups prune on stats).
    "ev_time_slice" -> QueryDef(
      s"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |FROM events
         |WHERE epoch_us(ts) >= $T10 AND epoch_us(ts) < $T20""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") >= lit(T10 * 1000L) && col("ts") < lit(T20 * 1000L))
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
    },

    // K1 + S3 under the driver's exact compare: the block-catalog
    // round trip. Events are stored week-by-week through
    // BlockCatalog.write (content-hash idempotent — the second write
    // pass is a no-op), small blocks are COMPACTED (tombstone log +
    // rewritten block), and the result is read back via the pruned
    // range scan. Oracle: the plain SQL time slice — so block
    // partitioning, the append-only meta log, compaction, and day/ts
    // pruning are all proven row-identical to the source table. The
    // per-week driver loop touches catalog METADATA only (a handful of
    // week ids), never data rows.
    "ev_catalog_scan" -> QueryDef(
      s"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |FROM events
         |WHERE epoch_us(ts) >= $T10 AND epoch_us(ts) <= $T20""".stripMargin) {
      (s, dir) =>
        val root = java.nio.file.Files.createTempDirectory("graft_cat_q").toString
        val cat = new graft.sources.BlockCatalog(s, root)
        val W = 7L * 86400000000L
        // persisted once: each catalog write reads its slice twice (the
        // fused hash+stats agg, then the data write) — 5 weekly writes
        // would otherwise re-scan the parquet ~10x
        val e = ev(s, dir)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val weeks = e.select((col("ts_us") / W).cast("long").as("w"))
          .distinct().collect().map(_.getLong(0)).sorted
        def weekSlice(w: Long) = e.filter((col("ts_us") / W).cast("long") === w)
        weeks.foreach(w => cat.write(weekSlice(w), "events", "all", "ts_us"))
        // idempotency: re-storing identical content must be skipped
        weeks.take(2).foreach { w =>
          require(!cat.write(weekSlice(w), "events", "all", "ts_us"),
            "duplicate block stored despite identical content hash")
        }
        // compact the weekly blocks into larger ones; the scan below
        // must be unaffected (tombstones + rewritten blocks)
        cat.compactSmallBlocks("events", "all", targetRows = 1L << 60, tsUs = "ts_us")
        cat.scan("events", "all", T10, T20)
          .select("event_id", "ts_us", "user_id", "event_type", "value")
    },

    // TIME TRAVEL under the driver's oracle: weekly blocks are written
    // as catalog versions 1..N, then COMPACTED (one more version,
    // metadata-only supersession — old dirs stay for snapshot reads);
    // the query reads the snapshot AS OF version 3 (the first three
    // weeks) through scanAsOf. Oracle: the plain SQL slice restricted
    // to the three smallest event weeks — so version stamping,
    // snapshot meta derivation, and compaction retention are all
    // proven row-identical to history.
    "ev_catalog_timetravel" -> QueryDef(
      s"""WITH wk AS (SELECT DISTINCT epoch_us(ts) // 604800000000 AS w FROM events),
         |cut AS (SELECT max(w) AS w FROM (SELECT w FROM wk ORDER BY w LIMIT 3) t)
         |SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |FROM events
         |WHERE epoch_us(ts) >= $T10 AND epoch_us(ts) <= $T20
         |  AND epoch_us(ts) // 604800000000 <= (SELECT w FROM cut)""".stripMargin) {
      (s, dir) =>
        val root = java.nio.file.Files.createTempDirectory("graft_tt_q").toString
        val cat = new graft.sources.BlockCatalog(s, root)
        val W = 7L * 86400000000L
        val e = ev(s, dir)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val weeks = e.select((col("ts_us") / W).cast("long").as("w"))
          .distinct().collect().map(_.getLong(0)).sorted
        weeks.foreach { w =>
          cat.write(e.filter((col("ts_us") / W).cast("long") === w),
            "events", "all", "ts_us")
        }
        val verAfter3 = math.min(3L, weeks.length.toLong)
        cat.compactSmallBlocks("events", "all", targetRows = 1L << 60,
          tsUs = "ts_us")
        cat.scanAsOf("events", "all", T10, T20, verAfter3)
          .select("event_id", "ts_us", "user_id", "event_type", "value")
    },

    // K2 end-to-end under the driver's oracle: the custom DSv2 replay
    // SOURCE (rate-limited micro-batches) feeds the streaming block
    // SINK (BlockWriter foreachBatch -> content-hash-idempotent
    // catalog writes, one block per micro-batch, AvailableNow drain),
    // then the catalog's pruned range scan reads the result back.
    // Oracle: the plain SQL time slice — the whole streaming
    // source -> sink -> catalog -> scan path proven row-identical to
    // the source table.
    "ev_stream_block_sink" -> QueryDef(
      s"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |FROM events
         |WHERE epoch_us(ts) >= $T10 AND epoch_us(ts) <= $T20""".stripMargin) {
      (s, dir) =>
        val root = java.nio.file.Files.createTempDirectory("graft_sink_q").toString
        val cat = new graft.sources.BlockCatalog(s, root)
        val perBatch = math.max(2000L, Tables.events(s, dir).count() / 5L)
        val stream = s.readStream
          .format("graft.sources.EventReplayProvider")
          .option("path", dir)
          .option("rowsPerBatch", perBatch)
          // field selection (r17): props never reaches the sink; see
          // ev_replay_source_agg / EventReplayProvider.inferSchema
          .option("columns", "event_id,ts,user_id,event_type,value")
          .load()
          .select(col("event_id"), expr("ts div 1000").as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
        val q = graft.streaming.BlockWriter.start(stream, cat, "events",
          "all", "ts_us", availableNow = true)
        q.awaitTermination()
        cat.scan("events", "all", T10, T20)
          .select("event_id", "ts_us", "user_id", "event_type", "value")
    },

    // §3.3 TrainSplit.timeSplit under the oracle: the leakage-safe
    // time-ordered 70/30 split — threshold = max ts among the k
    // smallest (k = floor(n*0.7), exact ordered rank, ties land in
    // train). Both halves emitted with a split marker so the boundary
    // rule itself is hash-checked. floor() in both engines (DuckDB's
    // double->int CAST rounds; Scala's toLong truncates).
    "ev_train_split" -> QueryDef(
      """WITH r AS (
        |  SELECT ts_us, row_number() OVER (ORDER BY ts_us) AS rn,
        |    count(*) OVER () AS n
        |  FROM (SELECT epoch_us(ts) AS ts_us FROM events)),
        |t AS (SELECT max(ts_us) AS thr FROM r
        |  WHERE rn <= greatest(1, CAST(floor(n * 0.7) AS BIGINT)))
        |SELECT e.event_id, epoch_us(e.ts) AS ts_us,
        |  CASE WHEN epoch_us(e.ts) <= t.thr THEN 'train' ELSE 'test' END AS split
        |FROM events e CROSS JOIN t""".stripMargin) { (s, dir) =>
      val e = ev(s, dir).select(col("event_id"), col("ts_us"))
      val (train, test) = graft.consumers.TrainSplit.timeSplit(e, "ts_us", 0.7)
      train.withColumn("split", lit("train"))
        .unionByName(test.withColumn("split", lit("test")))
    },

    // §3 data_ingest end-to-end under the oracle: events dumped to raw
    // CSV, ingested through Ingest.ingestCsv (schema'd scan ->
    // normalize -> ts-range-partitioned size-bounded blocks ->
    // content-hash catalog write), read back via the catalog. Oracle =
    // the source table, so CSV round-trip (shortest-repr doubles),
    // the O5 size split, and the catalog store/scan are all proven
    // row-identical.
    "ev_ingest_roundtrip" -> QueryDef(
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types._
      val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_q").toString
      ev(s, dir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(s"$tmp/raw")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts_us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val cat = new graft.sources.BlockCatalog(s, s"$tmp/cat")
      graft.sources.Ingest.ingestCsv(s, s"$tmp/raw", schema,
        normalize = df => df, catalog = cat, definition = "events",
        key = "all", tsUs = "ts_us", rowsPerBlock = 2000L)
      cat.scanAll("events", "all")
        .select("event_id", "ts_us", "user_id", "event_type", "value")
    },

    // O2 sortedness QA under the oracle: per-key violation counts of
    // "ts non-decreasing in seq order" where seq is a deterministic
    // order PERTURBATION (each block of 10 event_ids reversed) so the
    // assertion actually fires — the QA report frame a pipeline
    // materializes, not a vacuous zero.
    "ev_sort_violations" -> QueryDef(
      """SELECT event_type,
        |  CAST(sum(CASE WHEN prev > ts_us THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |  count(*) AS n_rows
        |FROM (SELECT event_type, epoch_us(ts) AS ts_us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY event_type
        |    ORDER BY (event_id // 10) * 10 + 9 - event_id % 10) AS prev
        |  FROM events) t
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Preprocess.tsViolationsBySeqReport(
        ev(s, dir), col("ts_us"),
        expr("(event_id div 10) * 10 + 9 - event_id % 10"),
        Seq(col("event_type")))
    },

    // P8 uniform downsample: every 10th row per event_type in total order.
    "ev_downsample" -> QueryDef(
      s"""SELECT event_id, event_type, value FROM (
         |  SELECT event_id, event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY $OKEY) AS rn
         |  FROM events) t
         |WHERE (rn - 1) % 10 = 0""".stripMargin) { (s, dir) =>
      WindowOps.downsample(ev(s, dir), Seq(col("event_type")), okey, 10)
        .select("event_id", "event_type", "value")
    },

    // A1 OHLCV per tumbling 1h bucket per event_type. open/close via
    // arg_min/arg_max on the total order key — a pure hash aggregation
    // (map-side combinable), no window sort.
    "ev_ohlcv_1h" -> QueryDef(OHLCV_SQL) { (s, dir) =>
      val vc = cents(col("value"))
      ev(s, dir)
        .groupBy(col("event_type"), WindowOps.bucket(col("ts_us"), H).as("bucket_us"))
        .agg(
          min_by(col("value"), okey).as("open"),
          max("value").as("high"),
          min("value").as("low"),
          max_by(col("value"), okey).as("close"),
          (sum(vc) / 100).as("volume"),
          when(sum(vc) =!= 0, sum(vc * vc) / sum(vc) / 100).as("vwap"),
          count(lit(1)).as("num_trades"))
    },

    // A1's STREAMING twin, driver-visible: the same declarative OHLCV
    // hash agg executed by the streaming engine over the events file
    // stream (Streaming.ohlcvStream), drained with AvailableNow in
    // complete mode — safe here because OHLCV state is one row per
    // (type, bucket), metadata-sized by construction. Single-sourced
    // oracle: the SAME SQL as ev_ohlcv_1h, so batch == stream is a
    // driver-checked identity, not a spec claim.
    "ev_ohlcv_stream" -> QueryDef(OHLCV_SQL) { (s, dir) =>
      // noDataBatch off: complete-mode snapshot — the last data batch
      // already wrote the full state. statePartitions from the state's
      // own cardinality class: one row per (type, hour bucket) —
      // metadata-sized at any corpus scale (ohlcvStream scaladoc).
      Streaming.runAvailableNow(
        Streaming.ohlcvStream(Streaming.eventsStream(s, dir), H),
        noDataBatch = false, statePartitions = Some(8))
    },

    // STREAM-STREAM interval join (J4's event-time range half): each
    // purchase joined to the same user's clicks in the preceding 6h —
    // the attribution/enrichment join, run on the STREAMING engine
    // (two watermarked sides, event-time range condition bounding both
    // state stores, append mode) and drained with AvailableNow. Inner
    // join → the emitted set is trigger-slicing-independent, so the
    // plain batch SQL below grades the streaming run exactly.
    "ev_stream_interval_join" -> QueryDef(
      """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
        |  epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us,
        |  CAST(round(p.value*100) AS BIGINT) AS p_cents,
        |  CAST(round(c.value*100) AS BIGINT) AS c_cents
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 21600000000
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)""".stripMargin) { (s, dir) =>
      val ev = Streaming.eventsStream(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts_us"), col("value").as("p_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts_us"), col("value").as("c_value"))
      val joined = Streaming.intervalJoinStream(purchases, clicks,
        "user_id", "ts_us", 21600000000L, "12 hours")
      // noDataBatch off: INNER stream-stream join emits on arrival
      // only — the engine's watermark-commit batch is a pure state
      // EVICTION scan (profiled as expensive as the data batch: the
      // join's four per-shard stores reload, scan and rewrite), and
      // eviction right before drain termination buys nothing.
      Streaming.runAvailableNow(joined.select(
        col("user_id"), col("p_id"), col("c_id"),
        unix_micros(col("l_ts")).as("p_ts_us"),
        unix_micros(col("r_ts")).as("c_ts_us"),
        round(col("p_value") * 100).cast("long").as("p_cents"),
        round(col("c_value") * 100).cast("long").as("c_cents")),
        "append", noDataBatch = false,
        // user-keyed join state is corpus-cardinality: shard count
        // derived from input size (corpusStateShards scaladoc)
        statePartitions = Streaming.corpusStateShards(s,
          s"$dir/events.parquet"))
    },

    // A2 sliding-window population stddev (volatility) per event_type,
    // 24h lookback, evaluated per event — native range frame, no
    // per-event recompute loop.
    "ev_volatility_24h" -> QueryDef(
      s"""SELECT event_id, event_type,
         |  round(stddev_pop(value) OVER (
         |    PARTITION BY event_type ORDER BY $OKEY
         |    RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW), 4) AS volatility
         |FROM events""".stripMargin) { (s, dir) =>
      // JVM deque fold, not the declarative range frame: same quantity,
      // same shuffle+sort, ~8x less window-machinery overhead (see
      // Preprocess.slidingStddevPop; WindowOps.volatility is the
      // declarative equivalent).
      graft.operators.Preprocess.slidingStddevPop(
          ev(s, dir).select(col("event_id"), col("event_type"),
            okey.as("okey"), col("value")),
          "okey", "value", D * 1000L, Seq("event_type"), "sd")
        .select(col("event_id"), col("event_type"),
          round(col("sd"), 4).as("volatility"))
    },

    // A2's DENSE-WINDOW scale variant, oracled: incremental sliding
    // stddev over cents-quantized prices (discrete-price semantics).
    // The two-pass fold above re-scans its window per emission (O(n*w)
    // — measured quadratic when window density explodes, SCALE.md);
    // this one maintains exact integer running sums, O(n) total:
    // sf10eq 32.3s -> ~1s for the identical workload shape.
    "ev_volatility_cents_24h" -> QueryDef(
      s"""SELECT event_id, event_type,
         |  round(stddev_pop(round(value*100)) OVER (
         |    PARTITION BY event_type ORDER BY $OKEY
         |    RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW) / 100, 4) AS volatility
         |FROM events""".stripMargin) { (s, dir) =>
      // chunkUnits = the window span: keys x chunks parallel groups
      // (5 types alone cap at 5 cores and one giant sort per key —
      // the sf100eq 13.9x/decade row), 2x bounded read amplification,
      // output bit-identical to the unchunked fold (PreprocessSpec)
      graft.operators.Preprocess.slidingStddevCentsIncremental(
          ev(s, dir).select(col("event_id"), col("event_type"),
            okey.as("okey"), cents(col("value")).as("c")),
          "okey", "c", D * 1000L, Seq("event_type"), "sd",
          chunkUnits = D * 1000L)
        .select(col("event_id"), col("event_type"),
          round(col("sd"), 4).as("volatility"))
    },

    // EXACT z-score anomaly flags over the 24h sliding stats: the
    // monitoring alert decided in PURE INTEGER arithmetic —
    // (n·x − s)² > 9·(n·ss − s²) over cents — so a borderline event
    // can never flip between engines (no stddev round, no sqrt, no
    // division anywhere near the comparison). Same window family as
    // ev_volatility_24h; the flag is the final gate a pipeline pages on.
    "ev_anomaly_exact" -> QueryDef(ANOMALY_SQL) {
      (s, dir) =>
        // the deque fold, time-chunked: the declarative RANGE frame
        // re-scans its window per row (no sliding-aggregate
        // incrementalization in WindowExec) — 14.7s vs 1.1s at sf0.1;
        // Preprocess.anomalyExactFold is the same integer decision
        // rule (WindowOps.anomalyExactFlag, spec-pinned equal) at
        // O(1)/row with keys x chunks parallelism
        val base = ev(s, dir).select(col("event_id"), col("event_type"),
          okey.as("okey"), cents(col("value")).cast("long").as("c"))
        graft.operators.Preprocess.anomalyExactFold(base, "okey", "c",
            D * 1000L, Seq("event_type"), z = 3, chunkUnits = D * 1000L)
          .select(col("event_id"), col("event_type"), col("n"),
            col("is_anomaly"))
    },

    // Forward-fill RESAMPLING: hourly close/volume per type over the
    // COMPLETE bucket spine — a bucket with no events still emits a
    // row carrying the last close (volume/count zero, is_gap marked).
    // The spine is span/width rows per key (metadata-sized), the fill
    // is one bucket-level window per key. ~40 gap buckets per type at
    // sf0.01 (probed), so the fill genuinely fires.
    "ev_ohlcv_ffill" -> QueryDef(
      s"""WITH a AS (
         |  SELECT event_type, (epoch_us(ts) // $H) * $H AS bucket_us,
         |    arg_max(value, $OKEY) AS close,
         |    CAST(sum(round(value*100)) AS BIGINT) AS volume_cents,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |bounds AS (SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
         |  FROM a GROUP BY 1),
         |sp AS (SELECT event_type, unnest(range(lo, hi + 1, $H)) AS bucket_us
         |  FROM bounds),
         |j AS (SELECT sp.event_type, sp.bucket_us, a.close, a.volume_cents, a.n
         |  FROM sp LEFT JOIN a USING (event_type, bucket_us))
         |SELECT event_type, bucket_us,
         |  last_value(close IGNORE NULLS) OVER (
         |    PARTITION BY event_type ORDER BY bucket_us
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
         |  coalesce(volume_cents, 0) AS volume_cents,
         |  coalesce(n, 0) AS n,
         |  close IS NULL AS is_gap
         |FROM j""".stripMargin) { (s, dir) =>
      val agg = ev(s, dir)
        .groupBy(col("event_type"),
          ((col("ts_us") / H).cast("long") * H).as("bucket_us"))
        .agg(max_by(col("value"), okey).as("close"),
          sum(cents(col("value"))).cast("long").as("volume_cents"),
          count(lit(1)).as("n"))
      WindowOps.resampleFfill(agg, "event_type", "bucket_us", H,
          fillCols = Seq("close"), zeroCols = Seq("volume_cents", "n"))
        .select(col("event_type"), col("bucket_us"), col("close"),
          col("volume_cents"), col("n"), col("is_gap"))
    },

    // Streaming twin: the SAME pure-integer anomaly rule raised AT
    // INGEST — per-key window deque in fMGWS state, drained with
    // AvailableNow under the SAME single-sourced SQL as the batch
    // fold (integer arithmetic makes stream == batch bit-exact under
    // any trigger slicing).
    "ev_anomaly_stream" -> QueryDef(ANOMALY_SQL) { (s, dir) =>
      import s.implicits._
      val src = Streaming.eventsStream(s, dir)
        .select(col("event_type").as("key"),
          (expr("ts div 1000") * 1000 + pmod(col("event_id"), lit(1000)))
            .as("okey"),
          col("event_id").as("eventId"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[Streaming.CentsEvent]
      // noDataBatch off: fMGWS emits per arrival, timeout only evicts.
      // statePartitions = |event types| bound: the per-key fold caps
      // usable parallelism at 5 keys whatever the shard count.
      Streaming.runAvailableNow(
          Streaming.anomalyExactStream(src, D * 1000L, z = 3)
            .toDF(),
          outputMode = "append", noDataBatch = false,
          statePartitions = Some(8))
        .select(col("eventId").as("event_id"), col("key").as("event_type"),
          col("n"), col("isAnomaly").as("is_anomaly"))
    },

    // A3 trade-volume imbalance per user over 24h lookback: buy =
    // 'purchase' notional, sell = 'view' notional, exact cents sums so
    // no rounding is needed at all.
    "ev_tvi_24h" -> QueryDef(
      s"""SELECT event_id, user_id,
         |  2*(b - sl)/NULLIF(b + sl, 0) AS tvi
         |FROM (
         |  SELECT event_id, user_id,
         |    sum(CASE WHEN event_type='purchase' THEN round(value*100) ELSE 0 END) OVER w AS b,
         |    sum(CASE WHEN event_type='view' THEN round(value*100) ELSE 0 END) OVER w AS sl
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $OKEY
         |    RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW)) t""".stripMargin) { (s, dir) =>
      // JVM deque fold (exact: cents sums are integer-valued doubles),
      // not the declarative range frame — same shuffle+sort, without
      // the per-row window-machinery constant. WindowOps.tviSided over
      // WindowOps.sliding is the declarative equivalent (spec-pinned
      // equal in WindowOpsSpec).
      graft.operators.Preprocess.slidingTvi(
          ev(s, dir).select(col("event_id"), col("user_id"), okey.as("okey"),
            when(col("event_type") === "purchase", cents(col("value")))
              .otherwise(lit(0.0)).as("b"),
            when(col("event_type") === "view", cents(col("value")))
              .otherwise(lit(0.0)).as("sl")),
          "okey", "b", "sl", D * 1000L, Seq("user_id"), "tvi")
        .select("event_id", "user_id", "tvi")
    },

    // A5 relative diff (value vs first value in 24h lookback) per user.
    // Pure value arithmetic on picked rows — exact, no rounding.
    "ev_diff_24h" -> QueryDef(
      s"""SELECT event_id, user_id,
         |  (value - first_value(value) OVER w)
         |    / NULLIF(first_value(value) OVER w, 0) AS rel_diff
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $OKEY
         |  RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      ev(s, dir).select(col("event_id"), col("user_id"),
        WindowOps.relDiff(col("value"), Seq(col("user_id")), okey, D).as("rel_diff"))
    },

    // A6 bucket sampling: latest value + event count per (event_type,
    // 10-minute bucket) — hash agg, no window.
    "ev_sample_10m" -> QueryDef(
      s"""SELECT event_type,
         |  (epoch_us(ts) // ${M10}) * ${M10} AS bucket_us,
         |  arg_max(value, $OKEY) AS last_value,
         |  count(*) AS n_events
         |FROM events
         |GROUP BY event_type, bucket_us""".stripMargin) { (s, dir) =>
      WindowOps.sampleBucket(ev(s, dir), col("ts_us"), okey, col("value"), M10,
        Seq(col("event_type")))
    },

    // §2.5 snapshot-delimited sessionization: running count of 'signup'
    // delimiters per user forms the session id; then per-session agg.
    "ev_session_groups" -> QueryDef(
      s"""SELECT user_id, session_id, count(*) AS n_events,
         |  sum(round(value*100))/100 AS sum_value
         |FROM (
         |  SELECT user_id, value,
         |    CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY user_id ORDER BY $OKEY
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM events) t
         |GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("session_id",
          WindowOps.delimitedGroupId(col("event_type") === "signup",
            Seq(col("user_id")), okey))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(cents(col("value"))) / 100).as("sum_value"))
    },

    // J1 backward as-of join: each purchase gets the latest preceding
    // 'view' of the same user (inclusive at equal ts). One shuffle on
    // user_id via the union+window plan (AsofJoin scaladoc). The view
    // side is pre-collapsed to one row per (user, microsecond) in BOTH
    // engines: DuckDB's ASOF JOIN has no tie-break, so equal-ts right
    // rows would otherwise be an engine-dependent coin flip.
    "ev_asof_join" -> QueryDef(
      s"""WITH v AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us,
         |    arg_max(value, $OKEY) AS view_value,
         |    max(event_id) AS view_event_id
         |  FROM events WHERE event_type='view'
         |  GROUP BY user_id, epoch_us(ts))
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         |  v.view_value, v.view_event_id
         |FROM (SELECT * FROM events WHERE event_type='purchase') p
         |ASOF LEFT JOIN v
         |  ON p.user_id = v.user_id AND epoch_us(p.ts) >= v.ts_us""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_us")
        .agg(max_by(col("value"), okey).as("view_value"),
          max(col("event_id")).as("view_event_id"))
      AsofJoin.asofJoin(purchases, views, "ts_us", Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("view_value"), col("view_event_id"))
    },

    // J1 forward as-of: each purchase gets the EARLIEST following
    // 'view' of the same user (inclusive at equal ts) — the
    // direction='forward' twin of ev_asof_join, backward on negated
    // time under the hood. Same pre-collapse of the view side.
    "ev_asof_forward" -> QueryDef(
      s"""WITH v AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us,
         |    arg_max(value, $OKEY) AS view_value,
         |    max(event_id) AS view_event_id
         |  FROM events WHERE event_type='view'
         |  GROUP BY user_id, epoch_us(ts))
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         |  f.view_value, f.view_event_id
         |FROM (SELECT * FROM events WHERE event_type='purchase') p
         |LEFT JOIN LATERAL (
         |  SELECT v.view_value, v.view_event_id FROM v
         |  WHERE v.user_id = p.user_id AND v.ts_us >= epoch_us(p.ts)
         |  ORDER BY v.ts_us LIMIT 1) f ON true""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_us")
        .agg(max_by(col("value"), okey).as("view_value"),
          max(col("event_id")).as("view_event_id"))
      AsofJoin.asofJoinForward(purchases, views, "ts_us", Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("view_value"), col("view_event_id"))
    },

    // J1-scale KEYLESS global as-of: each purchase gets the latest
    // preceding 'signup' across ALL users — no partition key, so the
    // naive plan is one global window partition (a single-node sort at
    // scale). This runs AsofJoin.asofJoinRangePartitioned instead:
    // range-partition on ts, per-partition fill, driver-side prefix
    // carry of <= numPartitions rows. Same backward-inclusive
    // semantics; signup side pre-collapsed per microsecond (no
    // tie-break in DuckDB's ASOF JOIN).
    "ev_asof_global" -> QueryDef(
      s"""WITH g AS (
         |  SELECT epoch_us(ts) AS ts_us,
         |    arg_max(value, $OKEY) AS sig_value,
         |    max(event_id) AS sig_event_id
         |  FROM events WHERE event_type='signup'
         |  GROUP BY epoch_us(ts))
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         |  g.sig_value, g.sig_event_id
         |FROM (SELECT * FROM events WHERE event_type='purchase') p
         |ASOF LEFT JOIN g ON epoch_us(p.ts) >= g.ts_us""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val signups = e.filter(col("event_type") === "signup")
        .groupBy("ts_us")
        .agg(max_by(col("value"), okey).as("sig_value"),
          max(col("event_id")).as("sig_event_id"))
      // numPartitions = 0: auto-size the range exchange from the data
      // (the sf100eq third-decade rule — a constant count turns this
      // into a linear scan of the densest slice)
      AsofJoin.asofJoinRangePartitioned(purchases, signups, "ts_us",
          numPartitions = 0)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("sig_value"), col("sig_event_id"))
    },

    // J1 skew-salted keyed as-of: identical semantics (and identical
    // oracle) to ev_asof_join, but through AsofJoin.asofJoinSalted —
    // the fill window partitions on (user_id, ts div 1day) so a hot
    // key spreads over ~30 bucket partitions, with the boundary carry
    // restored from the per-(key,bucket) prefix-scan frame. The plan
    // must show hashpartitioning(user_id, __asof_bkt) — that exchange
    // IS the skew mitigation under test.
    "ev_asof_salted" -> QueryDef(
      s"""WITH v AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us,
         |    arg_max(value, $OKEY) AS view_value,
         |    max(event_id) AS view_event_id
         |  FROM events WHERE event_type='view'
         |  GROUP BY user_id, epoch_us(ts))
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         |  v.view_value, v.view_event_id
         |FROM (SELECT * FROM events WHERE event_type='purchase') p
         |ASOF LEFT JOIN v
         |  ON p.user_id = v.user_id AND epoch_us(p.ts) >= v.ts_us""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_us")
        .agg(max_by(col("value"), okey).as("view_value"),
          max(col("event_id")).as("view_event_id"))
      AsofJoin.asofJoinSalted(purchases, views, "ts_us", Seq("user_id"),
          bucketUs = 24 * H)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("view_value"), col("view_event_id"))
    },

    // J1 nearest as-of: each purchase gets the time-closest 'view' of
    // the same user, equal distances resolved backward.
    "ev_asof_nearest" -> QueryDef(
      s"""WITH v AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us,
         |    arg_max(value, $OKEY) AS view_value,
         |    max(event_id) AS view_event_id
         |  FROM events WHERE event_type='view'
         |  GROUP BY user_id, epoch_us(ts))
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         |  f.view_value, f.view_event_id
         |FROM (SELECT * FROM events WHERE event_type='purchase') p
         |LEFT JOIN LATERAL (
         |  SELECT v.view_value, v.view_event_id FROM v
         |  WHERE v.user_id = p.user_id
         |  ORDER BY abs(v.ts_us - epoch_us(p.ts)), v.ts_us LIMIT 1) f ON true""".stripMargin) {
      (s, dir) =>
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us", "value")
        val views = e.filter(col("event_type") === "view")
          .groupBy("user_id", "ts_us")
          .agg(max_by(col("value"), okey).as("view_value"),
            max(col("event_id")).as("view_event_id"))
        AsofJoin.asofJoinNearest(purchases, views, "ts_us", Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
            col("view_value"), col("view_event_id"))
    },

    // J3 lookahead label shift: per user, the latest value at ts + 6h,
    // trailing 6h of each user's range truncated (no complete future).
    "ev_lookahead_label" -> QueryDef(
      s"""WITH b AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events)
         |SELECT event_id, user_id, ts_us, value,
         |  (SELECT l.value FROM b l
         |   WHERE l.user_id = b.user_id AND l.ts_us <= b.ts_us + ${6 * H}
         |   ORDER BY l.ts_us DESC, l.event_id DESC LIMIT 1) AS label_value
         |FROM b
         |WHERE ts_us <= (SELECT max(m.ts_us) FROM b m WHERE m.user_id = b.user_id)
         |  - ${6 * H}""".stripMargin) { (s, dir) =>
      val base = ev(s, dir).select("user_id", "event_id", "ts_us", "value")
      AsofJoin.lookaheadShift(base, "ts_us", 6 * H, Seq("user_id"),
          labelPrefix = "label", tieBreak = Some("event_id"))
        .select("event_id", "user_id", "ts_us", "value", "label_value")
    },

    // Spark's NATIVE session_window operator (vs ev_sessions_gap's
    // gaps-and-islands formulation): sessions merge while the gap is
    // STRICTLY below 24h — Spark's rule, mirrored in the oracle's
    // `>= D` new-session predicate — and window.end = last_ts + gap.
    "ev_session_window" -> QueryDef(
      s"""SELECT user_id,
         |  min(ts_us) AS start_us, max(ts_us) + ${D} AS end_us,
         |  count(*) AS n_events
         |FROM (
         |  SELECT user_id, ts_us,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, okey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS session_id
         |  FROM (
         |    SELECT user_id, ts_us, okey,
         |      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, okey)
         |        IS NULL THEN 1
         |      WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, okey)
         |        >= ${D} THEN 1 ELSE 0 END AS is_new
         |    FROM (SELECT user_id, epoch_us(ts) AS ts_us, $OKEY AS okey
         |          FROM events) t0) t1) t2
         |GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("event_ts", timestamp_micros(col("ts_us")))
        .groupBy(col("user_id"), session_window(col("event_ts"), "24 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
    },

    // A6 elapsed-throttle STREAMING twin, driver-visible: the same
    // fMGWS fold (Streaming.throttleElapsedStream) drained over the
    // events file stream with AvailableNow — and the oracle is the
    // identical recursive-CTE state replay that checks the batch
    // ev_throttle_elapsed, so batch, stream, and SQL all pin the same
    // state machine.
    "ev_throttle_stream" -> QueryDef(
      s"""WITH RECURSIVE o AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events),
         |r AS (
         |  SELECT user_id, rn, true AS emitted, ts_us AS last_emit
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.user_id, o.rn,
         |    o.ts_us - r.last_emit >= ${6 * H} AS emitted,
         |    CASE WHEN o.ts_us - r.last_emit >= ${6 * H}
         |         THEN o.ts_us ELSE r.last_emit END AS last_emit
         |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
         |SELECT o.event_id, o.user_id, o.ts_us, o.value
         |FROM r JOIN o USING (user_id, rn) WHERE r.emitted""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val src = Streaming.eventsStream(s, dir)
          .select(col("user_id").cast("string").as("key"),
            expr("ts div 1000").as("tsUs"), col("event_id").as("seq"),
            col("value"))
          .as[Streaming.ThrottleEvent]
        // noDataBatch off: fMGWS emits per arrival (NoTimeout state)
        Streaming.runAvailableNow(
            Streaming.throttleElapsedStream(src, 6 * H).toDF(),
            outputMode = "append", noDataBatch = false,
            statePartitions = Streaming.corpusStateShards(s,
              s"$dir/events.parquet"))
          .select(col("key").cast("long").as("user_id"),
            col("tsUs").as("ts_us"), col("seq").as("event_id"), col("value"))
    },

    // A2 sliding-stddev STREAMING twin, driver-visible: the keyed
    // lookback-deque fold (Streaming.slidingStddevStream) over the
    // events file stream, against the same declarative range-frame
    // oracle shape as ev_volatility_24h (equal-okey rows are frame
    // peers in both).
    "ev_volatility_stream" -> QueryDef(
      s"""SELECT event_type, okey, value,
         |  round(stddev_pop(value) OVER (
         |    PARTITION BY event_type ORDER BY okey
         |    RANGE BETWEEN ${D * 1000L} PRECEDING AND CURRENT ROW), 4) AS volatility
         |FROM (SELECT event_type, $OKEY AS okey, value FROM events) t""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val src = Streaming.eventsStream(s, dir)
          .select(col("event_type").as("key"),
            (expr("ts div 1000") * 1000 + pmod(col("event_id"), lit(1000)))
              .as("okey"),
            col("value"))
          .as[Streaming.ValueEvent]
        // noDataBatch off: fMGWS emits per arrival (NoTimeout state);
        // statePartitions = |event types| bound (5-key fold)
        Streaming.runAvailableNow(
            Streaming.slidingStddevStream(src, D * 1000L).toDF(),
            outputMode = "append", noDataBatch = false,
            statePartitions = Some(8))
          .select(col("key").as("event_type"), col("okey"), col("value"),
            round(col("stddev"), 4).as("volatility"))
    },

    // S6 custom DSv2 source, driver-visible: the EventReplayProvider
    // MicroBatchStream (offset tracking + rowsPerBatch rate control —
    // the live-feed interface parity source) replayed to completion
    // under Trigger.AvailableNow (SupportsTriggerAvailableNow
    // admission control) into a streaming aggregation; oracle = the
    // plain batch GROUP BY. Multi-batch offsets, the subscription
    // path, and the streaming agg state all sit under the exact hash.
    // rowsPerBatch scales with the feed (~5 micro-batches at any SF) —
    // the multi-batch path is what's being exercised, not a fixed rate.
    "ev_replay_source_agg" -> QueryDef(
      """SELECT event_type, count(*) AS n,
        |  sum(round(value*100))/100 AS sum_value, max(event_id) AS max_id
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val perBatch = math.max(2000L, Tables.events(s, dir).count() / 5L)
      val stream = s.readStream
        .format("graft.sources.EventReplayProvider")
        .option("path", dir)
        .option("rowsPerBatch", perBatch)
        // field selection (r17): the agg reads 3 of 6 feed columns, and
        // streaming scans get no Catalyst column pruning — unselected
        // columns would ride the driver buffer AND every trigger's task
        // closures (EventReplayProvider.inferSchema scaladoc)
        .option("columns", "event_id,event_type,value")
        .load()
      // noDataBatch off: complete-mode snapshot (no watermark at all).
      // statePartitions from state cardinality: one row per event type.
      Streaming.runAvailableNow(
        stream.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 100)) / 100).as("sum_value"),
            max(col("event_id")).as("max_id")),
        noDataBatch = false, statePartitions = Some(8))
    },

    // J6 combine_latest, driver-visible: the keyed fMGWS state operator
    // (Streaming.combineLatest — one output per input carrying the
    // latest value of every feature seen so far for the key) driven by
    // the STREAMING engine over the events file stream with
    // AvailableNow, map exploded to rows. Event time = event_id
    // (globally unique), so the fold's (ts, feature) processing order
    // is a total order and the frame is deterministic. Oracle: for
    // each event, each feature's arg_max-by-event_id value among the
    // user's rows up to and including it — the declarative restatement
    // of last-value-per-feature state.
    "ev_combine_latest" -> QueryDef(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value FROM events),
        |x AS (
        |  SELECT a.user_id, a.event_id, b.event_type AS feature,
        |    arg_max(b.value, b.event_id) AS value
        |  FROM e a JOIN e b
        |    ON b.user_id = a.user_id AND b.event_id <= a.event_id
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, event_id, feature, value FROM x""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val src = Streaming.eventsStream(s, dir)
          .select(col("user_id").cast("string").as("key"),
            col("event_id").as("ts_us"),
            col("event_type").as("feature"), col("value"))
          .as[Streaming.FeatureEvent]
        // noDataBatch off: fMGWS emits per arrival (NoTimeout state);
        // user-keyed state is corpus-cardinality: shard count derived
        // from input size (corpusStateShards scaladoc)
        Streaming.runAvailableNow(
            Streaming.combineLatest(src).toDF(), outputMode = "append",
            noDataBatch = false,
            statePartitions = Streaming.corpusStateShards(s,
              s"$dir/events.parquet"))
          .select(col("key").cast("long").as("user_id"),
            col("ts_us").as("event_id"),
            explode(col("values")).as(Seq("feature", "value")))
    },

    // U1 union-all of overlapping slices + exact dedup + agg.
    "ev_union_distinct" -> QueryDef(
      s"""SELECT event_type, count(*) AS n, sum(round(value*100))/100 AS sum_value
         |FROM (SELECT DISTINCT * FROM (
         |  SELECT event_id, event_type, value FROM events WHERE epoch_us(ts) < $T20
         |  UNION ALL
         |  SELECT event_id, event_type, value FROM events WHERE epoch_us(ts) >= $T10)) t
         |GROUP BY event_type""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val a = e.filter(col("ts_us") < T20).select("event_id", "event_type", "value")
      val b = e.filter(col("ts_us") >= T10).select("event_id", "event_type", "value")
      a.unionByName(b).dropDuplicates()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100).as("sum_value"))
    },

    // P4 preprocess: rows grouped into nested per-bucket `orders`
    // arrays (collect_list(struct) + sort_array), then re-exploded flat
    // so the grouping+ordering round trip is oracle-checkable.
    "ev_preprocess_nested" -> QueryDef(
      s"""SELECT user_id, bucket_us,
         |  row_number() OVER (PARTITION BY user_id, bucket_us
         |    ORDER BY ts_us, value) - 1 AS pos,
         |  ts_us, value
         |FROM (SELECT user_id, (epoch_us(ts) // ${H}) * ${H} AS bucket_us,
         |  epoch_us(ts) AS ts_us, value FROM events) t""".stripMargin) { (s, dir) =>
      val grouped = graft.operators.Preprocess.groupNested(
        ev(s, dir).withColumn("bucket_us", WindowOps.bucket(col("ts_us"), H)),
        Seq(col("user_id"), col("bucket_us")),
        Seq(col("ts_us"), col("value")))
      grouped.select(col("user_id"), col("bucket_us"),
          posexplode(col("orders")).as(Seq("pos", "o")))
        .select(col("user_id"), col("bucket_us"), col("pos"),
          col("o.ts_us").as("ts_us"), col("o.value").as("value"))
    },

    // A6 elapsed-time throttle (stateful variant): emit only rows >= 6h
    // after the previously emitted row per user. Path-dependent fold →
    // rows-only check; semantics covered by PreprocessSpec.
    // A6 elapsed-time throttle: path-dependent per-key fold, oracled
    // via a RECURSIVE CTE that replays the same state machine row by
    // row (rank per key, carry last_emit) — upgraded from py-oracle to
    // a driver-visible DuckDB oracle in round 3.
    "ev_throttle_elapsed" -> QueryDef(
      s"""WITH RECURSIVE o AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events),
         |r AS (
         |  SELECT user_id, rn, true AS emitted, ts_us AS last_emit
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.user_id, o.rn,
         |    o.ts_us - r.last_emit >= ${6 * H} AS emitted,
         |    CASE WHEN o.ts_us - r.last_emit >= ${6 * H}
         |         THEN o.ts_us ELSE r.last_emit END AS last_emit
         |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
         |SELECT o.event_id, o.user_id, o.ts_us, o.value
         |FROM r JOIN o USING (user_id, rn) WHERE r.emitted""".stripMargin) { (s, dir) =>
      graft.operators.Preprocess.throttleElapsed(
        ev(s, dir).select("event_id", "user_id", "ts_us", "value"),
        "ts_us", 6 * H, Seq("user_id"), seq = Some("event_id"))
    },

    // Session windows by inactivity gap (gaps-and-islands; the
    // reference has no session windows — beyond-reference surface).
    // New session when > 24h elapsed since the user's previous event.
    "ev_sessions_gap" -> QueryDef(
      s"""SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us
         |FROM (
         |  SELECT user_id, ts_us,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY okey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM (
         |    SELECT user_id, ts_us, okey,
         |      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY okey)
         |        IS NULL THEN 1
         |      WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY okey)
         |        > ${D} THEN 1 ELSE 0 END AS is_new
         |    FROM (SELECT user_id, epoch_us(ts) AS ts_us, $OKEY AS okey
         |          FROM events) t0) t1) t2
         |GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("okey"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("okey", okey)
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(wOrd))
        .withColumn("is_new",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > D, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
    },

    // §2.8 json: extract the catalog-style JSON blob column.
    "ev_json_extract" -> QueryDef(
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n, sum(round(value*100))/100 AS sum_value
        |FROM events GROUP BY k_mod""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("k_mod", get_json_object(col("props"), "$.k").cast("long") % 10)
        .groupBy("k_mod")
        .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100).as("sum_value"))
    },

    // Ranking/analytic window functions (§2.5: absent by name in the
    // reference, free in the engine): per-user lag delta + value rank.
    "ev_lag_rank" -> QueryDef(
      s"""SELECT event_id, user_id,
         |  value - lag(value) OVER w AS delta_prev,
         |  lead(event_id) OVER w AS next_event,
         |  rank() OVER (PARTITION BY user_id ORDER BY round(value*100) DESC,
         |    event_id ASC) AS value_rank
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $OKEY)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(okey)
      val wr = Window.partitionBy(col("user_id"))
        .orderBy(cents(col("value")).desc, col("event_id").asc)
      ev(s, dir).select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
        lead(col("event_id"), 1).over(w).as("next_event"),
        rank().over(wr).as("value_rank"))
    },

    // Exact interpolated percentiles (beyond-reference engine surface;
    // rounded 4dp — the two engines interpolate with different but
    // equivalent expression shapes).
    "ev_value_quantiles" -> QueryDef(
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
    },

    // Sketch twin of ev_value_quantiles for the 100 TB path (GK sketch:
    // map-side-mergeable, O(accuracy) shuffle per key vs the exact
    // path's per-group value sort), under a REAL cross-engine oracle.
    // Sketch VALUES are engine-specific by construction, but the GK
    // guarantee is not: the query emits the exact data values at the
    // edges of the sketch's admissible rank window plus within_bound =
    // (sketch value inside the window). DuckDB reproduces the edges
    // from exact ranks and TRUE by construction — so the frame is
    // hash-comparable, and a bound-violating sketch breaks the hash.
    "ev_value_quantiles_approx" -> QueryDef(
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |grp AS (SELECT event_type, max(n) AS n FROM ranked GROUP BY event_type),
        |b AS (
        |  SELECT g.event_type, g.n, qs.q,
        |    greatest(1, CAST(ceil(qs.q * g.n - (g.n / 10000.0 + 1.0)) AS BIGINT) + 1) AS r_lo,
        |    least(g.n, CAST(floor(qs.q * g.n + (g.n / 10000.0 + 1.0)) AS BIGINT) + 1) AS r_hi
        |  FROM grp g CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) qs)
        |SELECT b.event_type, b.q, b.n, lo.value AS lo_val, hi.value AS hi_val,
        |  TRUE AS within_bound
        |FROM b
        |JOIN ranked lo ON lo.event_type = b.event_type AND lo.rn = b.r_lo
        |JOIN ranked hi ON hi.event_type = b.event_type AND hi.rn = b.r_hi""".stripMargin) {
      (s, dir) =>
        WindowOps.approxQuantileBounds(ev(s, dir), col("value"),
          Seq("event_type"), Seq(0.5, 0.9, 0.99), accuracy = 10000)
    },

    // Distinct aggregation (beyond-reference engine surface).
    "ev_distinct_users" -> QueryDef(
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
    },

    // J4 keyed equi-join (v2 keyed stream join, batch form): purchases
    // paired with same-user signups.
    "ev_keyed_join" -> QueryDef(
      """SELECT p.user_id AS user_id, count(*) AS n_pairs,
        |  sum(round(p.value*100))/100 AS sum_purchase
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |JOIN (SELECT * FROM events WHERE event_type='signup') sg
        |  ON p.user_id = sg.user_id
        |GROUP BY p.user_id""".stripMargin) { (s, dir) =>
      val e = ev(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))
      val sg = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user_id"))
      p.join(sg, col("user_id") === col("s_user_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          (sum(cents(col("value"))) / 100).as("sum_purchase"))
    })
}
