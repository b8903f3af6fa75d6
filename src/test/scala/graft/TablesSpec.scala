package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events `ts` contract across the driver's parquet encodings
  * (CLAUDE.md trap list: the encoding CHANGED between rounds — INT64
  * TIMESTAMP(NANOS) through r7, TIMESTAMP(MICROS, NTZ) from r8). The
  * contract every consumer relies on: after Tables.normalizeTs, `ts`
  * is an epoch-NANOS Long and `ts div 1000` equals DuckDB
  * `epoch_us(ts)`. A silent break here zeroes the whole scoreboard,
  * so all three normalizeTs branches are pinned to the same value. */
class TablesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  // one instant: 2021-03-02T00:00:01.5Z
  private val us = 1614643201500000L

  test("Sessions: stable unique token per session, live entries survive the sweep") {
    import graft.core.Sessions
    val t1 = Sessions.token(spark)
    assert(t1 == Sessions.token(spark), "token must be stable per session")
    assert(!Sessions.dead(t1), "a reachable, running session is live")
    // a sweep over a cache keyed by live tokens evicts nothing
    val m = new java.util.concurrent.ConcurrentHashMap[(String, Int), String]
    m.put((t1, 1), "a"); m.put((t1, 2), "b")
    Sessions.sweepDead(m)(_._1)
    assert(m.size == 2, "live-session entries must survive sweepDead")
    // an unknown token (a session this JVM never registered — the
    // recycled-identity stand-in) is dead and its entries evicted
    val ghost = java.util.UUID.randomUUID().toString
    m.put((ghost, 3), "c")
    assert(Sessions.dead(ghost))
    Sessions.sweepDead(m)(_._1)
    assert(m.keySet().size == 2 && !m.containsKey((ghost, 3)),
      "dead-token entries must be evicted, live ones kept")
  }

  test("normalizeTs: all three physical encodings yield the same nanos Long") {
    val spark0 = spark
    import spark0.implicits._
    // NANOS encoding surfaces as a raw Long under nanosAsLong
    val asLong = Seq(us * 1000L).toDF("ts")
    // MICROS (isAdjustedToUTC=true) reads as TIMESTAMP_LTZ
    val asLtz = Seq(us).toDF("u")
      .select(timestamp_micros(col("u")).as("ts"))
    // MICROS (isAdjustedToUTC=false) reads as TIMESTAMP_NTZ; sessions
    // run UTC so the NTZ->LTZ cast is value-preserving
    val asNtz = asLtz.select(col("ts").cast("timestamp_ntz").as("ts"))
    val got = Seq(asLong, asLtz, asNtz).map { df =>
      Tables.normalizeTs(df).select(col("ts")).collect()(0).getLong(0)
    }
    assert(got.forall(_ == us * 1000L), s"got $got, want ${us * 1000L}")
  }

  test("driver parquet honors the contract: ts div 1000 is epoch micros") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val r = ev.select((col("ts") / lit(1000000000L)).cast("long").as("sec"))
      .agg(min("sec"), max("sec")).collect()(0)
    // epoch seconds in a sane modern range — catches unit slips
    // (micros-as-nanos would land in 1970, nanos-as-micros in year 52k)
    assert(r.getLong(0) > 1_000_000_000L && r.getLong(1) < 4_000_000_000L,
      s"epoch-seconds range ${r.getLong(0)}..${r.getLong(1)}")
  }

  test("normalizeTs rejects an unknown physical type loudly") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq("x").toDF("ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeTs(bad)
    }
    assert(e.getMessage.contains("unexpected type"))
  }
}
