package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Block storage + catalog (SURVEY.md §1.3, K1/S3): replaces the
  * reference's gzip-parquet blocks + SQLAlchemy index with a
  * day-partitioned parquet table per (definition, key) and a small
  * parquet metadata table.
  *
  * - Writes are content-hash idempotent (reference `tasks.py:208-215`):
  *   an order-independent xxhash64 digest of the frame skips duplicate
  *   stores.
  *  - Range scans push `day` down as partition pruning and the exact ts
  *   bounds down to row-group stats — the reference's SQL-index block
  *   discovery becomes a free Catalyst feature.
  *
  * At cluster scale the metadata table would live in a transactional
  * table format; the interface here is the engine-facing contract.
  */
class BlockCatalog(val spark: SparkSession, root: String) {

  private def dataPath(definition: String, key: String) = s"$root/$definition/$key/data"
  private def metaPath = s"$root/_meta"

  /** Order-independent content hash of a frame: decimal sum of row
    * hashes (wrap-free under ANSI; duplicate-multiset-sensitive,
    * unlike XOR). */
  def contentHash(df: DataFrame): String = {
    val cols = df.columns.sorted.map(col)
    val h = df
      .select(xxhash64(cols.toIndexedSeq: _*).cast(org.apache.spark.sql.types.DecimalType(38, 0))
        .as("h"))
      .agg(sum(col("h"))).collect()(0)
    if (h.isNullAt(0)) "empty" else h.getDecimal(0).toBigInteger.toString(16)
  }

  /** The raw append-only meta LOG: one row per catalog event —
    * op="add" (block stored) or op="drop" (block superseded by
    * compaction). APPEND-ONLY is the concurrency contract: every meta
    * mutation is a parquet append (new part files, never rewriting
    * existing ones), so a concurrent writer's append can never be lost
    * to a read-modify-write overwrite (the pre-round-3 design was
    * last-writer-wins on compaction). An empty frame only when the
    * catalog genuinely does not exist yet (missing-path
    * AnalysisException); transient IO / permission errors propagate —
    * swallowing them would read as "no catalog" and trigger silent
    * recompute+rewrite in buildMemoized. */
  private def metaLog: DataFrame =
    try {
      // mergeSchema: log rows written before the `ver` column existed
      // coexist with stamped rows (missing ver reads as null -> 0)
      val log = spark.read.option("mergeSchema", "true").parquet(metaPath)
      if (log.columns.contains("ver"))
        log.withColumn("ver", coalesce(col("ver"), lit(0L)))
      else if (log.columns.contains("hash")) log.withColumn("ver", lit(0L))
      else log
    }
    catch { case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame }

  /** Highest version stamped for (definition, key); 0 for an empty or
    * pre-versioning catalog. Every meta append (one [[write]], one
    * [[compactSmallBlocks]] pass) carries currentVersion + 1 — a
    * compaction's tombstones and adds share ONE version, so no
    * snapshot can observe a half-applied compaction. Version
    * assignment follows the documented single-writer-per-
    * (definition, key) contract (racing writers could stamp the same
    * version; content-hash dedup keeps that harmless for adds).
    *
    * Caching semantics (ADVICE r8, reworked r10): this public reader
    * reflects the CURRENT log on every call — a read-only instance, or
    * one polling between another process's appends, sees every commit
    * (the r8 instance-lifetime cache answered a reader's first scan
    * forever, so `scanAsOf(currentVersion(...))` could silently miss
    * newer versions). Since r10 the scan itself rides [[logRows]], the
    * fingerprint-validated collected log, so "reflects the current
    * log" costs a directory listing, not a Spark job, when nothing
    * changed. Writers additionally ride [[cachedVersion]]: the
    * first append scans once, then each bump advances the instance
    * cache — without that, the Nth write re-reads and aggregates the
    * whole mergeSchema'd meta log, making N appends O(N^2) log scans
    * (ADVICE r7). The write cache is exactly as safe as the version
    * numbers themselves: both assume the single writer per
    * (definition, key); an out-of-band append by ANOTHER instance is
    * the same race the contract already excludes. A fresh read here
    * also refreshes the write cache forward (never backward).
    *
    * The reader path itself is cached too (r10, recovering the r9
    * correctness-for-speed cost — +0.3s across the two catalog queries
    * at sf0.1, far worse at 100x catalog churn): the cache key is the
    * meta log's FILE-LISTING fingerprint. The log is append-only
    * parquet — every commit, from any process, materializes as new
    * uniquely-named part files — so "the listing is unchanged" proves
    * "no commit landed since the cached scan", which is exactly the
    * staleness the r8 instance-lifetime cache got wrong. The listing
    * is one driver-side filesystem call instead of a full mergeSchema
    * parquet read + agg. */
  def currentVersion(definition: String, key: String): Long = {
    val k = (definition, key)
    val scanned = scanVersion(definition, key)
    val v = math.max(scanned, verCache.getOrElse(k, 0L))
    verCache.update(k, v)
    v
  }

  /** Names + sizes of every file under the meta log dir — the
    * append-only contract means any commit, from any process, changes
    * this set (new uniquely-named part files), so an unchanged listing
    * proves the cached collected log is current. One driver-side
    * filesystem call instead of a mergeSchema parquet read + Spark job. */
  private def logFingerprint: String =
    try {
      val p = new org.apache.hadoop.fs.Path(metaPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) "absent"
      else {
        val it = fs.listFiles(p, true)
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          parts += s"${s.getPath.getName}:${s.getLen}"
        }
        parts.sorted.mkString(",")
      }
    } catch { case _: java.io.IOException => s"unlistable-${System.nanoTime()}" }

  /** One collected log event — the full meta row (r16: the stats ride
    * along so [[metaAsOf]] can be served from the collected cache with
    * zero Spark jobs; pre-r16 they stayed in the DataFrame views and
    * every `meta` call paid a mergeSchema parquet read). */
  private case class LogRow(definition: String, key: String,
      hash: String, op: String, ver: Long,
      startTs: Long, endTs: Long, numRows: Long)

  private var logCache: Option[(String, Seq[LogRow])] = None

  /** Meta-log READ instrumentation (r16 probe surface): cache-miss
    * collects of the merged log — (count, nanos). The CatalogMetaProbe
    * separates this from data read/write wall. */
  private var metaReadCount = 0L
  private var metaReadNanos = 0L
  private[graft] def metaReadStats: (Long, Long) = (metaReadCount, metaReadNanos)
  private[graft] def resetMetaReadStats(): Unit = {
    metaReadCount = 0L; metaReadNanos = 0L
  }

  /** Advance the collected-log cache IN PLACE after one of our own
    * meta appends (r16): the appended rows are known exactly, so the
    * next read needs no mergeSchema re-collect — the fingerprint is
    * re-listed AFTER the append, pairing the new listing with
    * old rows + ours. Exactly as safe as the version numbers
    * themselves (single writer per (definition, key), the verCache
    * contract): a FOREIGN append racing into the gap between our
    * parquet append and the listing would be fingerprint-absorbed
    * with its rows missing — the same race the contract already
    * excludes. Cold cache (None) stays cold: nothing to advance.
    * `advanceLogCache=false` restores the r15 invalidate-on-append
    * behavior (the probe's control arm). */
  private[graft] var advanceLogCache: Boolean = true
  private def noteAppended(rows: Seq[LogRow]): Unit =
    logCache = logCache match {
      case Some((_, old)) if advanceLogCache =>
        Some((logFingerprint, old ++ rows))
      case _ => None
    }

  /** The meta log COLLECTED, cached per listing fingerprint. The log
    * is metadata-sized by contract (one row per block event), so a
    * local copy is always affordable — and it converts the read-side
    * helpers (version lookup, hash-dedup check, live-block derivation)
    * from one Spark read + job EACH into zero jobs while the log is
    * unchanged, one small collect when it isn't (r10: ev_catalog_scan
    * paid ~10 mergeSchema log reads per run; the listing fingerprint
    * keeps every cache hit exactly as fresh as a rescan). */
  private def logRows: Seq[LogRow] = {
    val fp = logFingerprint
    logCache match {
      case Some((`fp`, rows)) => rows
      // the listing already proved the log dir does not exist — skip
      // the Spark read whose whole job would be to throw (a missing-
      // path resolution walks the full DataSource machinery and logs a
      // FileNotFoundException stack before the AnalysisException; every
      // fresh catalog paid it once, r17)
      case _ if fp == "absent" =>
        logCache = Some((fp, Seq.empty))
        Seq.empty
      case _ =>
        val t0 = System.nanoTime()
        val log = metaLog
        val rows: Seq[LogRow] =
          if (!log.columns.contains("hash")) Seq.empty
          else {
            val op = if (log.columns.contains("op")) col("op")
              else lit("add")
            log.select(col("definition"), col("key"), col("hash"),
                op.as("op"), col("ver"), col("start_ts"), col("end_ts"),
                col("num_rows"))
              .collect().toSeq
              .map(r => LogRow(r.getString(0), r.getString(1),
                r.getString(2), r.getString(3), r.getLong(4),
                r.getLong(5), r.getLong(6), r.getLong(7)))
          }
        metaReadCount += 1
        metaReadNanos += System.nanoTime() - t0
        logCache = Some((fp, rows))
        rows
    }
  }

  /** Driver-side meta APPEND (r16 optimization): a meta commit is a
    * metadata-sized filesystem operation — the Delta-commit shape —
    * but writing it as a 1-row Spark DataFrame paid a full job
    * (scheduler + task + commit protocol, ~0.1-0.3 s) PER APPEND; an
    * ingest loop appends once per block, so the job overhead grew
    * with block count while the payload stayed bytes. parquet-mr
    * writes the identical columns Spark wrote pre-r16 (int64 / UTF8
    * binary; readers match parquet columns by name), into a uniquely
    * named part file — the append-only contract is unchanged, and
    * mergeSchema reads mix both writers' files freely. */
  private def appendMetaRows(rows: Seq[LogRow]): Unit = {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.example.GroupWriteSupport
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = MessageTypeParser.parseMessageType(
      """message graft_meta {
        |  optional binary definition (UTF8);
        |  optional binary key (UTF8);
        |  optional int64 start_ts;
        |  optional int64 end_ts;
        |  optional int64 num_rows;
        |  optional binary hash (UTF8);
        |  optional binary op (UTF8);
        |  optional int64 ver;
        |}""".stripMargin)
    // CLONE the Hadoop conf (r16 ADVICE): GroupWriteSupport.setSchema
    // mutates the Configuration, and the session-shared
    // sparkContext.hadoopConfiguration can be concurrently serialized
    // by a running Spark job (ConcurrentModificationException) or have
    // another example-writer schema race this one.
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    GroupWriteSupport.setSchema(schema, conf)
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    val file = new org.apache.hadoop.fs.Path(s"$metaPath/part-$id.parquet")
    // WRITE-TEMP-THEN-RENAME (r16 ADVICE, medium): parquet-mr writes
    // straight to its target path, so a crash mid-write would leave a
    // truncated footer at the FINAL name and every subsequent
    // mergeSchema read of the whole log would fail — the Spark append
    // this replaced went through the file-commit protocol. The dotted
    // temp name is invisible to parquet directory reads (hidden-file
    // convention); the rename is atomic on a real filesystem, restoring
    // write()'s advertised crash-safe idempotency.
    val tmp = new org.apache.hadoop.fs.Path(s"$metaPath/.part-$id.parquet.tmp")
    val writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(tmp, conf))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.append("definition", r.definition)
      g.append("key", r.key)
      g.append("start_ts", r.startTs)
      g.append("end_ts", r.endTs)
      g.append("num_rows", r.numRows)
      g.append("hash", r.hash)
      g.append("op", r.op)
      g.append("ver", r.ver)
      writer.write(g)
    } finally writer.close()
    val fs = tmp.getFileSystem(conf)
    if (!fs.rename(tmp, file))
      throw new java.io.IOException(
        s"meta append commit failed: rename $tmp -> $file")
  }

  /** Write-path version lookup: instance cache, log scan only on the
    * first touch of (definition, key). */
  private def cachedVersion(definition: String, key: String): Long =
    verCache.getOrElseUpdate((definition, key),
      scanVersion(definition, key))

  private def scanVersion(definition: String, key: String): Long = {
    val rs = logRows.filter(r => r.definition == definition && r.key == key)
    if (rs.isEmpty) 0L else rs.map(_.ver).max
  }

  private val verCache =
    scala.collection.mutable.HashMap.empty[(String, String), Long]

  /** Advance the instance version cache after a meta append. */
  private def noteVersion(definition: String, key: String, ver: Long): Unit =
    verCache.update((definition, key), ver)

  /** The LIVE catalog view, derived from the log at read time:
    * op="add" rows deduplicated on (definition, key, hash) — two racing
    * writers of identical content collapse to one block — minus every
    * tombstoned hash. Tombstones are permanent: a content hash, once
    * compacted away, stays known forever (its rows live on inside the
    * compacted block, so re-admitting it would double-count). */
  def meta: DataFrame = metaAsOf(Long.MaxValue)

  /** The catalog view AS OF a version: the same add-minus-tombstone
    * derivation over only the log rows stamped <= asOfVer — SNAPSHOT
    * READS (time travel). A compaction's drops and adds share one
    * version, so every snapshot sees either the pre-compaction blocks
    * or the compacted ones, never a mix. */
  def metaAsOf(asOfVer: Long): DataFrame = {
    // served from the collected fingerprint-validated log (r16): the
    // log is metadata-sized by contract, so the view is a local frame
    // — zero Spark jobs while the log is unchanged (pre-r16 every call
    // paid a mergeSchema parquet read + join). Add-dedup keeps the
    // LOWEST version per (definition, key, hash) — first cataloged —
    // where the DataFrame dropDuplicates kept an arbitrary one.
    import spark.implicits._
    val all = logRows
    if (all.isEmpty) return spark.emptyDataFrame
    val rs = all.filter(_.ver <= asOfVer)
    val drops = rs.filter(_.op == "drop")
      .map(r => (r.definition, r.key, r.hash)).toSet
    rs.filter(_.op == "add")
      .groupBy(r => (r.definition, r.key, r.hash))
      .map { case (_, g) => g.minBy(_.ver) }
      .filterNot(r => drops((r.definition, r.key, r.hash)))
      .toSeq.sortBy(r => (r.definition, r.key, r.ver, r.hash))
      .map(r => (r.definition, r.key, r.startTs, r.endTs, r.numRows, r.hash))
      .toDF("definition", "key", "start_ts", "end_ts", "num_rows", "hash")
  }

  /** True iff the hash was EVER cataloged for (definition, key) — adds
    * and tombstones alike (tombstoned content already lives inside a
    * compacted block; re-storing it would duplicate rows). */
  private def hashExists(definition: String, key: String, hash: String): Boolean =
    logRows.exists(r =>
      r.definition == definition && r.key == key && r.hash == hash)

  /** Store a ts-ordered frame as day-partitioned parquet + one metadata
    * row; skipped (false) when the identical content is already
    * cataloged. `tsUs` must be an epoch-micros Long column name.
    *
    * Crash-safe idempotency: the data lands under the deterministic
    * partition dir `block=<contentHash>` with overwrite mode, and the
    * meta row is appended only afterwards. A retry after a crash
    * between the two writes overwrites the same block dir (no
    * duplication) and then records the meta row; a retry after both
    * simply hits the hash check. */
  def write(df: DataFrame, definition: String, key: String, tsUs: String): Boolean = {
    // ONE aggregation pass computes the content hash AND the catalog
    // stats — at scale each stored block costs a single read before the
    // data write, not two (hash job + stats job). Same hash definition
    // as contentHash (order-independent decimal sum of row xxhash64).
    val cols = df.columns.sorted.map(col)
    val agg = df
      .select(xxhash64(cols.toIndexedSeq: _*)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"),
        col(tsUs).as("t"))
      .agg(sum(col("h")).as("hs"), min(col("t")).as("start_ts"),
        max(col("t")).as("end_ts"), count(lit(1)).as("num_rows"))
      .collect()(0)
    if (agg.isNullAt(0)) return false // empty frame: nothing to store
    val hash = agg.getDecimal(0).toBigInteger.toString(16)
    if (hashExists(definition, key, hash)) return false
    val withDay = df.withColumn("day",
      date_format(timestamp_micros(col(tsUs)), "yyyy-MM-dd"))
    withDay.write.mode("overwrite").partitionBy("day")
      .parquet(s"${dataPath(definition, key)}/block=$hash")
    val ver = cachedVersion(definition, key) + 1L
    val row = LogRow(definition, key, hash, "add", ver,
      agg.getLong(1), agg.getLong(2), agg.getLong(3))
    appendMetaRows(Seq(row)) // driver-side commit — no Spark job
    noteVersion(definition, key, ver)
    noteAppended(Seq(row))
    true
  }

  /** Block hashes the catalog currently lists for (definition, key) —
    * the set of LIVE blocks. Scans filter on it so the meta table is
    * the single source of truth: a data directory not (yet) in meta —
    * a write that crashed before its meta append, or a compaction
    * leftover — is invisible garbage, never a double-count. */
  private def liveHashes(definition: String, key: String,
      asOfVer: Long = Long.MaxValue): Seq[String] = {
    // same add-minus-tombstone derivation as metaAsOf, over the cached
    // collected log — zero Spark jobs when the log is unchanged
    val rs = logRows.filter(r =>
      r.definition == definition && r.key == key && r.ver <= asOfVer)
    val drops = rs.filter(_.op == "drop").map(_.hash).toSet
    rs.filter(_.op == "add").map(_.hash).distinct.filterNot(drops)
  }

  /** Full scan of a (definition, key) table (meta-listed blocks only;
    * `block` is a partition column, so the isin filter prunes
    * directories). */
  def scanAll(definition: String, key: String): DataFrame = {
    val hs = liveHashes(definition, key)
    spark.read.parquet(dataPath(definition, key))
      .filter(col("block").isin(hs: _*)).drop("block")
  }

  /** Range scan: partition pruning on block + day + exact ts bounds. */
  def scan(definition: String, key: String, startUs: Long, endUs: Long,
      tsUs: String = "ts_us"): DataFrame =
    scanAsOf(definition, key, startUs, endUs, Long.MaxValue, tsUs)

  /** SNAPSHOT range scan — time travel: the block set is the catalog
    * view as of `asOfVer` ([[metaAsOf]]); compaction keeps superseded
    * data directories on disk (metadata-only supersession), so every
    * snapshot stays readable until [[vacuum]] reclaims it — the
    * Delta-style compact/vacuum split. Reproducibility surface: a
    * training run records (definition, key, version) and can re-read
    * the exact corpus it trained on regardless of later ingests or
    * compactions.
    *
    * Version UNIQUENESS — not just add-dedup — is part of the
    * single-writer contract: two racing appenders could stamp the
    * same version, and a snapshot at that version would then observe
    * a mix of two logical commits (harmless for content-hash-deduped
    * adds, ambiguous if a compaction races a writer). One writer per
    * (definition, key) makes every version a single atomic commit. */
  def scanAsOf(definition: String, key: String, startUs: Long, endUs: Long,
      asOfVer: Long, tsUs: String = "ts_us"): DataFrame = {
    val hs = liveHashes(definition, key, asOfVer)
    spark.read.parquet(dataPath(definition, key))
      .filter(col("block").isin(hs: _*))
      .filter(col("day") >= date_format(timestamp_micros(lit(startUs)), "yyyy-MM-dd")
        && col("day") <= date_format(timestamp_micros(lit(endUs)), "yyyy-MM-dd"))
      .filter(col(tsUs) >= startUs && col(tsUs) <= endUs)
      .drop("block")
  }

  /** Reclaim data directories no longer live in the CURRENT view
    * (tombstoned by compaction). After a vacuum, snapshots that
    * referenced the reclaimed blocks are no longer readable — the
    * retention trade every compact/vacuum design makes; vacuum when
    * the reproducibility window has passed. Returns directories
    * deleted. */
  def vacuum(definition: String, key: String): Int = {
    val live = liveHashes(definition, key).toSet
    val dropped = logRows
      .filter(r => r.definition == definition && r.key == key && r.op == "drop")
      .map(_.hash).distinct
      .filterNot(live)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    var n = 0
    dropped.foreach { h =>
      val p = new org.apache.hadoop.fs.Path(s"${dataPath(definition, key)}/block=$h")
      if (fs.exists(p)) { fs.delete(p, true); n += 1 }
    }
    n
  }

  /** Contiguous covered ranges for a (definition, key): catalog blocks
    * sorted by start_ts merge while the inter-block gap (next start_ts
    * minus running end_ts) is <= maxGapUs; a larger gap starts a new
    * range. Mirrors the reference's gap rule splitting block ranges
    * (svoe `featurizer/blocks/blocks.py:84-101`, <=1s default). The
    * collect is catalog metadata (one row per block), not data. */
  def coveredRanges(definition: String, key: String,
      maxGapUs: Long = 1000000L): Seq[(Long, Long)] = {
    val m = meta
    if (!m.columns.contains("start_ts")) return Seq.empty
    val blocks = m.filter(col("definition") === definition && col("key") === key)
      .select("start_ts", "end_ts")
      .orderBy(col("start_ts"), col("end_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    blocks.foldLeft(Vector.empty[(Long, Long)]) { case (acc, (s, e)) =>
      acc.lastOption match {
        case Some((rs, re)) if s - re <= maxGapUs =>
          acc.init :+ (rs, math.max(re, e))
        case _ => acc :+ (s, e)
      }
    }
  }

  /** Compact runs of small blocks (reference `streaming/block_writer/
    * memory_based_compactor.py:11-51`, which buffers frames until a
    * memory target before storing — here as post-hoc small-file
    * compaction, the Spark-idiomatic shape). Adjacent blocks (by
    * start_ts) are greedily grouped until the group reaches
    * `targetRows`; each multi-block group is rewritten as ONE block and
    * its members tombstoned in the catalog — METADATA-ONLY
    * supersession: the old directories stay on disk so snapshot reads
    * ([[scanAsOf]]) keep working until [[vacuum]] reclaims them.
    * Returns the number of groups compacted.
    *
    * Crash safety: scans read only meta-LIVE blocks, so the order
    * (write new dirs → append tombstones+adds to the log) never
    * double-counts — a crash before the log append leaves invisible
    * new dirs that the re-run overwrites (same content hash).
    *
    * Concurrency: the log append keeps this lock-free against
    * concurrent WRITERS — their adds land as separate part files and
    * are never overwritten (the pre-round-3 read-modify-write meta
    * rewrite silently dropped any add that raced it). Run at most ONE
    * compactor per (definition, key) at a time: two racing compactors
    * could tombstone the same members and admit two overlapping
    * combined blocks — a documented single-compactor constraint, same
    * as the reference's per-writer compactor. Readers racing a
    * [[vacuum]] dir deletion can hit a vanished block dir
    * (plain-parquet limit; a transactional table format makes the
    * whole step one commit at cluster scale, class scaladoc). */
  def compactSmallBlocks(definition: String, key: String, targetRows: Long,
      tsUs: String = "ts_us"): Int = {
    val m = meta
    if (!m.columns.contains("hash")) return 0
    val blocks = m.filter(col("definition") === definition && col("key") === key)
      .select("start_ts", "end_ts", "num_rows", "hash")
      .orderBy(col("start_ts"), col("end_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // greedy adjacent grouping to the row target
    val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[(Long, Long, Long, String)]]
    var cur = Vector.empty[(Long, Long, Long, String)]
    var curRows = 0L
    blocks.foreach { b =>
      cur :+= b; curRows += b._3
      if (curRows >= targetRows) { groups += cur; cur = Vector.empty; curRows = 0L }
    }
    if (cur.nonEmpty) groups += cur
    val toCompact = groups.filter(_.size > 1)
    if (toCompact.isEmpty) return 0

    val newRows = toCompact.map { grp =>
      val combined = grp.map(b =>
          spark.read.parquet(s"${dataPath(definition, key)}/block=${b._4}")
            .drop("day"))
        .reduce(_ unionByName _)
      val hash = contentHash(combined)
      val withDay = combined.withColumn("day",
        date_format(timestamp_micros(col(tsUs)), "yyyy-MM-dd"))
      withDay.write.mode("overwrite").partitionBy("day")
        .parquet(s"${dataPath(definition, key)}/block=$hash")
      (definition, key, grp.map(_._1).min, grp.map(_._2).max,
        grp.map(_._3).sum, hash)
    }
    // APPEND tombstones for the compacted members + adds for the new
    // blocks — never rewrite the log (see scaladoc: a concurrent
    // writer's append must survive this). ONE version for the whole
    // compaction: snapshots see pre- or post-compaction, never a mix.
    // Superseded data DIRECTORIES stay on disk for snapshot reads
    // ([[scanAsOf]]); [[vacuum]] reclaims them when the
    // reproducibility window has passed.
    val ver = cachedVersion(definition, key) + 1L
    val appended =
      toCompact.flatten.toSeq.map(b =>
        LogRow(definition, key, b._4, "drop", ver, b._1, b._2, b._3)) ++
      newRows.map(t => LogRow(t._1, t._2, t._6, "add", ver, t._3, t._4, t._5))
    appendMetaRows(appended) // driver-side commit — no Spark job
    noteVersion(definition, key, ver)
    noteAppended(appended)
    toCompact.size
  }

  /** Gap-aware range scan: one frame per contiguous covered sub-range
    * intersecting [startUs, endUs], so a request spanning a hole gets
    * the hole surfaced as a range split instead of silence (the
    * reference splits ranges at gaps; plain `scan` is the
    * hole-oblivious variant). */
  def scanSplitAtGaps(definition: String, key: String, startUs: Long,
      endUs: Long, maxGapUs: Long = 1000000L,
      tsUs: String = "ts_us"): Seq[((Long, Long), DataFrame)] =
    coveredRanges(definition, key, maxGapUs)
      .filter { case (s, e) => e >= startUs && s <= endUs }
      .map { case (s, e) =>
        val (lo, hi) = (math.max(s, startUs), math.min(e, endUs))
        ((lo, hi), scan(definition, key, lo, hi, tsUs))
      }
}
