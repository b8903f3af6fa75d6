package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.L2Book
import graft.operators.L2Book.{Level, Update}

/** Golden + invariant tests for the order-book state machine
  * (FIXTURES.md §1 l2_book_incremental requirements). */
class L2BookSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def replay(us: Seq[Update], depth: Int = 3,
      samplingUs: Option[Long] = None) =
    L2Book.replay(us.toDF(), depth, samplingUs)
      .collect().sortBy(s => (s.instrument, s.ts_us))

  private val snap = Seq(
    Update("X", 1, 0, "SNAPSHOT", "bid", 100.0, 5.0),
    Update("X", 1, 1, "SNAPSHOT", "bid", 99.0, 2.0),
    Update("X", 1, 2, "SNAPSHOT", "ask", 101.0, 3.0),
    Update("X", 1, 3, "SNAPSHOT", "ask", 102.0, 4.0))

  test("snapshot then ADD/SET/SUB mutate levels; one emit per ts") {
    val out = replay(snap ++ Seq(
      Update("X", 2, 4, "ADD", "bid", 100.0, 1.0),   // 100 -> 6
      Update("X", 3, 5, "SET", "ask", 101.0, 9.0),   // 101 -> 9
      Update("X", 4, 6, "SUB", "bid", 99.0, 2.0),    // 99 deleted
      Update("X", 5, 7, "SET", "bid", 98.5, 7.0)))   // new level
    assert(out.length == 5)
    assert(out(0).bids == Seq(Level(100, 5), Level(99, 2)))
    assert(out(0).asks == Seq(Level(101, 3), Level(102, 4)))
    assert(out(1).bids == Seq(Level(100, 6), Level(99, 2)))
    assert(out(2).asks == Seq(Level(101, 9), Level(102, 4)))
    assert(out(3).bids == Seq(Level(100, 6)))
    assert(out(4).bids == Seq(Level(100, 6), Level(98.5, 7)))
  }

  test("second SNAPSHOT run resets the book") {
    val out = replay(snap ++ Seq(
      Update("X", 9, 8, "SNAPSHOT", "bid", 50.0, 1.0),
      Update("X", 9, 9, "SNAPSHOT", "ask", 51.0, 1.0)))
    assert(out.last.bids == Seq(Level(50, 1)))
    assert(out.last.asks == Seq(Level(51, 1)))
  }

  test("same-ts SET below the snapshot's seq is wiped; after it, kept") {
    // apply order is (ts, seq): a SET earlier in seq than a same-ts
    // SNAPSHOT run is cleared by the wipe; a later one survives. The
    // SQL oracle reconstructs exactly this rule (StatefulQueries) —
    // caught originally by the collision-stress corpus.
    val out = replay(Seq(
      Update("X", 1, 0, "SET", "bid", 471.0, 5.0),       // pre-snapshot: wiped
      Update("X", 1, 1, "SNAPSHOT", "bid", 271.0, 2.0),
      Update("X", 1, 2, "SET", "ask", 464.0, 3.0)))      // post-snapshot: kept
    assert(out.length == 1)
    assert(out(0).bids == Seq(Level(271.0, 2.0)))
    assert(out(0).asks == Seq(Level(464.0, 3.0)))
  }

  test("SET between same-ts snapshot rows re-wipes (snapshot run broken)") {
    val out = replay(Seq(
      Update("X", 1, 0, "SNAPSHOT", "bid", 100.0, 5.0),
      Update("X", 1, 1, "SET", "bid", 90.0, 1.0),
      Update("X", 1, 2, "SNAPSHOT", "bid", 80.0, 2.0))) // new run: wipes again
    assert(out.length == 1)
    assert(out(0).bids == Seq(Level(80.0, 2.0)))
  }

  test("SUB on a missing level is tolerated (logged-not-fatal semantics)") {
    val out = replay(snap ++ Seq(Update("X", 2, 4, "SUB", "bid", 77.0, 9.0)))
    assert(out.last.bids == Seq(Level(100, 5), Level(99, 2)))
  }

  test("top-depth truncation and bid/ask ordering") {
    val levels = (1 to 6).flatMap { i =>
      Seq(Update("X", 1, i * 2L, "SNAPSHOT", "bid", 100.0 - i, i.toDouble),
        Update("X", 1, i * 2L + 1, "SNAPSHOT", "ask", 100.0 + i, i.toDouble))
    }
    val out = replay(levels, depth = 3)
    assert(out.head.bids.map(_.price) == Seq(99.0, 98.0, 97.0)) // desc
    assert(out.head.asks.map(_.price) == Seq(101.0, 102.0, 103.0)) // asc
  }

  test("split-with-snapshot-padding replays to the same final book") {
    // FIXTURES.md: a split block is padded with the running book as a
    // synthetic SNAPSHOT — replaying (full) vs (head; snapshot+tail)
    // must agree on the final state.
    val tail = Seq(
      Update("X", 10, 20, "ADD", "bid", 100.0, 2.5),
      Update("X", 11, 21, "SET", "ask", 103.0, 8.0),
      Update("X", 12, 22, "SUB", "bid", 99.0, 1.0))
    val full = replay(snap ++ tail)
    // running book after `snap` == snap itself (it is a full snapshot),
    // re-emitted at ts just after the head block:
    val padded = snap.map(u => u.copy(ts_us = 9, seq = u.seq + 100))
    val split = replay(padded ++ tail)
    assert(full.last.bids == split.last.bids)
    assert(full.last.asks == split.last.asks)
  }

  test("multiple instruments keep independent state") {
    val out = replay(snap ++ Seq(
      Update("Y", 1, 0, "SNAPSHOT", "bid", 10.0, 1.0),
      Update("Y", 2, 1, "ADD", "bid", 10.0, 1.0)))
    val y = out.filter(_.instrument == "Y")
    assert(y.last.bids == Seq(Level(10, 2)))
    assert(out.filter(_.instrument == "X").head.bids.head == Level(100, 5))
  }

  test("sampling emits last state per bucket") {
    val out = replay(snap ++ Seq(
      Update("X", 100, 4, "SET", "bid", 100.0, 1.0),
      Update("X", 150, 5, "SET", "bid", 100.0, 2.0),
      Update("X", 260, 6, "SET", "bid", 100.0, 3.0)),
      samplingUs = Some(100L))
    // buckets: [0,100): ts1 ; [100,200): ts150 ; [200,300): ts260
    assert(out.map(_.ts_us).toSeq == Seq(1L, 150L, 260L))
    assert(out(1).bids.head == Level(100, 2))
  }
}
