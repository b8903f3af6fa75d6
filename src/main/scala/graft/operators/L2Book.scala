package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** L2 order-book snapshot reconstruction (svoe `l2_snapshot_fd.py:21-161`
  * + state machine `l2_snapshot_fd/utils.py:10-89`, A4 — the reference's
  * hardest operator).
  *
  * Semantics (cryptotick flavor, flattened to one row per order update):
  *   - a run of consecutive SNAPSHOT rows replaces the book;
  *   - ADD adds to a level (creating it), SET overwrites (0 deletes),
  *     SUB subtracts (missing level tolerated, clamped at 0 — reference
  *     logs and continues, `utils.py:44-57`);
  *   - one snapshot is emitted per distinct timestamp (all same-ts rows
  *     applied first), truncated to the top `depth` levels per side;
  *   - with `samplingUs` set, only the last snapshot per time bucket is
  *     emitted (svoe `sampling='1s'` mode — its fast path).
  *
  * Execution: secondary sort, not a driver loop — `repartition(key)` +
  * `sortWithinPartitions(key, ts, seq)` + `mapPartitions` with one
  * mutable book per key run. Scales to any number of instruments (the
  * shuffle is one exchange on instrument; state is per-key and bounded
  * by book depth). The streaming twin runs the same `BookState` inside
  * `flatMapGroupsWithState` (graft.streaming).
  */
object L2Book {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{abs => fabs, lit, try_element_at}

  /** P6 mid-price from a snapshot frame (svoe `mid_price_fd.py:24-58`):
    * (best_bid + best_ask) / 2; null while a side is empty. */
  def midPrice(bids: Column, asks: Column): Column =
    (try_element_at(bids, lit(1)).getField("price")
      + try_element_at(asks, lit(1)).getField("price")) / 2

  /** P7 relative bid-ask spread (svoe `relative_bid_ask_spread_fd.py`):
    * 2|bid0 - ask0| / (bid0 + ask0); null while a side is empty. */
  def relSpread(bids: Column, asks: Column): Column = {
    val b = try_element_at(bids, lit(1)).getField("price")
    val a = try_element_at(asks, lit(1)).getField("price")
    org.apache.spark.sql.functions.when(a + b =!= lit(0.0), fabs(a - b) * 2 / (a + b))
  }

  case class Update(instrument: String, ts_us: Long, seq: Long,
      update_type: String, side: String, price: Double, size: Double)

  case class Level(price: Double, size: Double)

  case class Snapshot(instrument: String, ts_us: Long,
      bids: Seq[Level], asks: Seq[Level])

  /** Mutable one-instrument book; shared by batch and streaming paths. */
  final class BookState extends Serializable {
    val bids = new java.util.TreeMap[Double, Double](
      java.util.Collections.reverseOrder[Double]())
    val asks = new java.util.TreeMap[Double, Double]()
    // A snapshot "run" is the group of SNAPSHOT rows sharing one ts
    // (the reference groups raw rows by (timestamp, update_type)); a
    // SNAPSHOT at a new ts starts a fresh book even if no non-snapshot
    // row intervened.
    private var snapTs = Long.MinValue

    def apply(u: Update): Unit = {
      val book = if (u.side == "bid") bids else asks
      u.update_type match {
        case "SNAPSHOT" =>
          if (u.ts_us != snapTs) { bids.clear(); asks.clear(); snapTs = u.ts_us }
          if (u.size > 0) book.put(u.price, u.size) else book.remove(u.price)
        case "ADD" =>
          snapTs = Long.MinValue
          val cur = Option(book.get(u.price)).getOrElse(0.0)
          book.put(u.price, cur + u.size)
        case "SET" =>
          snapTs = Long.MinValue
          if (u.size > 0) book.put(u.price, u.size) else book.remove(u.price)
        case "SUB" =>
          snapTs = Long.MinValue
          val cur = Option(book.get(u.price)).getOrElse(0.0)
          val next = cur - u.size
          if (next > 0) book.put(u.price, next)
          else book.remove(u.price) // missing/overdrawn level tolerated
        case other =>
          throw new IllegalArgumentException(s"unknown update_type: $other")
      }
    }

    def top(depth: Int): (Seq[Level], Seq[Level]) = {
      import scala.jdk.CollectionConverters._
      (bids.entrySet().iterator().asScala.take(depth)
        .map(e => Level(e.getKey, e.getValue)).toSeq,
        asks.entrySet().iterator().asScala.take(depth)
          .map(e => Level(e.getKey, e.getValue)).toSeq)
    }
  }

  /** Batch replay: updates (any partitioning) → per-ts (or per-bucket
    * when sampling) top-`depth` snapshots per instrument. */
  def replay(updates: DataFrame, depth: Int, samplingUs: Option[Long] = None)
      : Dataset[Snapshot] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .repartition(col("instrument"))
      .sortWithinPartitions("instrument", "ts_us", "seq")
      .as[Update]
      .mapPartitions { iter =>
        new Iterator[Snapshot] {
          private val it = iter.buffered
          private var state: BookState = _
          private var cur: String = null
          private var pending: Option[Snapshot] = None

          private def bucket(ts: Long): Long =
            samplingUs.map(w => Math.floorDiv(ts, w)).getOrElse(ts)

          override def hasNext: Boolean = pending.isDefined || advance()

          private def advance(): Boolean = {
            while (it.hasNext && pending.isEmpty) {
              val u = it.head
              if (cur == null || u.instrument != cur) {
                cur = u.instrument
                state = new BookState
              }
              // apply all rows of this (instrument, ts)
              val ts = u.ts_us
              while (it.hasNext && it.head.instrument == cur && it.head.ts_us == ts)
                state.apply(it.next())
              // emit unless the next row falls in the same sampling bucket
              val more = it.hasNext && it.head.instrument == cur
              val emit = !more || bucket(it.head.ts_us) != bucket(ts)
              if (emit) {
                val (b, a) = state.top(depth)
                pending = Some(Snapshot(cur, ts, b, a))
              }
            }
            pending.isDefined
          }

          override def next(): Snapshot = {
            if (!hasNext) throw new NoSuchElementException
            val s = pending.get
            pending = None
            s
          }
        }
      }
  }
}
