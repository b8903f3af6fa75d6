package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S6 — a REAL custom streaming `Source` completing the live-feed
  * interface parity (reference
  * `streaming/event_emitter/cryptofeed_event_emitter.py:21-138`): the
  * WebSocket transport is env-blocked (zero egress), so the feed is the
  * events table replayed in event order, but everything around the
  * transport is the genuine Structured Streaming contract — a DSv2
  * `TableProvider` whose `MicroBatchStream` tracks offsets (restart
  * resumes from the checkpointed offset, `deserializeOffset` heals the
  * cursor), applies rate control (`rowsPerBatch` per trigger — the
  * emitter's throttle), and exposes the subscription surface
  * (`eventTypes` — the emitter's channel/callback binding) as source
  * options.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.EventReplayProvider")
  *   .option("path", sfDir)
  *   .option("rowsPerBatch", 500)
  *   .option("eventTypes", "trade,book")   // optional subscription
  *   .load()
  * }}}
  *
  * Like the reference's emitter (a single feed-handler process) and
  * Spark's own `MemoryStream`/rate sources, the replayed slice is
  * buffered in the driver: a live adapter is a receiver, not a
  * splittable scan — per-trigger slices are shipped to executors
  * through `InputPartition`s. Replay of unbounded history belongs to
  * the batch path ([[graft.streaming.Streaming.eventsStream]]'s file
  * source); this source exists for the live-feed API shape.
  */
class EventReplayProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-event-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.streaming.Streaming.EventsNanosSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventReplayTable(schema, properties)
}

private[sources] class EventReplayTable(schema: StructType,
    properties: util.Map[String, String]) extends Table with SupportsRead {

  override def name(): String =
    s"graft-event-replay(${properties.getOrDefault("path", "?")})"
  override def schema(): StructType = schema0
  private val schema0 = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new EventReplayMicroBatchStream(options)
      }
    }
}

/** Offset = number of feed rows already emitted (event order). */
private[sources] case class ReplayOffset(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

private[sources] class EventReplayMicroBatchStream(
    options: CaseInsensitiveStringMap) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private val path = {
    val p = options.get("path")
    require(p != null, "graft-event-replay requires option 'path'")
    p
  }
  private val rowsPerBatch = options.getLong("rowsPerBatch", 500L)
  private val slices = options.getInt("slices", 4)
  private val eventTypes: Option[Set[String]] =
    Option(options.get("eventTypes"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  // The buffered feed: events in (ts, event_id) order — the emitter's
  // delivery order contract — filtered to the subscribed types.
  private lazy val feed: Array[(Long, Long, Long, String, Double, String)] = {
    val spark = SparkSession.active
    val base = graft.Tables.events(spark, path)
    val subscribed = eventTypes.fold(base)(ts =>
      base.filter(col("event_type").isin(ts.toSeq: _*)))
    subscribed
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))
  }

  // Rate-control cursor. commit/deserializeOffset push it forward so a
  // restart from a checkpoint never re-plans already-committed rows.
  private var cursor = 0L

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val o = ReplayOffset(json.trim.toLong)
    synchronized { cursor = math.max(cursor, o.idx) }
    o
  }

  // Trigger.AvailableNow contract (SupportsTriggerAvailableNow, which
  // extends SupportsAdmissionControl): freeze the drain target at
  // prepare time; the admission-control latestOffset then paces
  // rowsPerBatch per trigger toward it, and the engine re-triggers
  // until the cursor stops advancing — an AvailableNow run replays the
  // WHOLE feed in rate-limited micro-batches instead of stopping after
  // the first (continuous/processAllAvailable runs behave as before:
  // the target stays unbounded).
  private var availableNowTarget: Long = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowTarget = feed.length.toLong
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  private def available: Long =
    math.min(feed.length.toLong, availableNowTarget)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    synchronized {
      val base = start.asInstanceOf[ReplayOffset].idx
      val step = limit match {
        case r: ReadMaxRows => r.maxRows()
        case _ => rowsPerBatch
      }
      cursor = math.min(available, math.max(cursor, base + step))
      ReplayOffset(cursor)
    }

  override def latestOffset(): Offset = synchronized {
    cursor = math.min(available, cursor + rowsPerBatch)
    ReplayOffset(cursor)
  }

  override def commit(end: Offset): Unit = synchronized {
    cursor = math.max(cursor, end.asInstanceOf[ReplayOffset].idx)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].idx.toInt
    val e = math.max(s, end.asInstanceOf[ReplayOffset].idx.toInt)
    val batch = feed.slice(s, e)
    val per = math.max(1, (batch.length + slices - 1) / slices)
    batch.grouped(per).map(g => ReplayInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new ReplayPartitionReader(
          partition.asInstanceOf[ReplayInputPartition].rows)
    }

  override def stop(): Unit = ()
}

private[sources] case class ReplayInputPartition(
    rows: Array[(Long, Long, Long, String, Double, String)]) extends InputPartition

private[sources] class ReplayPartitionReader(
    rows: Array[(Long, Long, Long, String, Double, String)])
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = {
    val r = rows(i)
    new GenericInternalRow(Array[Any](r._1, r._2, r._3,
      UTF8String.fromString(r._4), r._5, UTF8String.fromString(r._6)))
  }
  override def close(): Unit = ()
}
