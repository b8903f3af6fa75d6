package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSqlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql works over registered views + graft functions") {
    Graft.register(spark, dir)
    val n = spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0)
    assert(n == 6000)

    // events view carries ts_us; joins + functions compose in SQL
    val top = spark.sql(
      """SELECT e.event_type, count(*) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY n DESC LIMIT 1""".stripMargin).collect()
    assert(top.nonEmpty && top(0).getLong(1) > 0)

    val d = spark.sql(
      """SELECT graft_dot(a.embedding, b.embedding) AS d
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect()(0).getDouble(0)
    assert(!d.isNaN)
  }

  test("operator outputs round-trip through spark.sql as graft_ views") {
    Graft.register(spark, dir)
    Graft.registerQueryViews(spark, dir)
    // an operator RESULT (windowed OHLCV) joins a base table in SQL —
    // the SURVEY §2.10 promise: the engine's outputs are SQL-addressable
    val r = spark.sql(
      """SELECT o.event_type, count(*) AS buckets, sum(o.num_trades) AS n
        |FROM graft_ev_ohlcv_1h o
        |GROUP BY 1 ORDER BY 1 LIMIT 3""".stripMargin).collect()
    assert(r.nonEmpty && r.forall(_.getLong(1) > 0))
    // dedup keepers stay a subset of documents, checked IN SQL
    val bad = spark.sql(
      """SELECT count(*) AS n FROM graft_doc_dedup_exact g
        |LEFT JOIN documents d ON d.doc_id = g.keep_id
        |WHERE d.doc_id IS NULL""".stripMargin).collect()(0).getLong(0)
    assert(bad == 0L)
    // the kNN graph view exposes rnk <= 5 per src
    val mx = spark.sql(
      "SELECT max(rnk) AS m FROM graft_emb_knn_graph").collect()(0).getInt(0)
    assert(mx <= 5)
  }

  test("STREAMING operator outputs round-trip through spark.sql views") {
    Graft.register(spark, dir)
    // a streaming query's drained output registers exactly like a batch
    // one (runAvailableNow returns the drained frame), so the SQL
    // surface covers the streaming half of the engine too — and the
    // batch≡stream parity contract can be checked IN SQL: the
    // full-outer join of the streaming OHLCV view against its batch
    // twin must align bit-for-bit on every (bucket, type) cell
    Graft.registerQueryViews(spark, dir,
      Seq("ev_ohlcv_stream", "ev_ohlcv_1h"))
    val mism = spark.sql(
      """SELECT count(*) AS n
        |FROM graft_ev_ohlcv_stream s
        |FULL OUTER JOIN graft_ev_ohlcv_1h b
        |  ON s.bucket_us = b.bucket_us AND s.event_type = b.event_type
        |WHERE s.bucket_us IS NULL OR b.bucket_us IS NULL
        |  OR s.num_trades IS DISTINCT FROM b.num_trades
        |  OR s.open IS DISTINCT FROM b.open
        |  OR s.close IS DISTINCT FROM b.close
        |  OR s.high IS DISTINCT FROM b.high
        |  OR s.low IS DISTINCT FROM b.low""".stripMargin)
      .collect()(0).getLong(0)
    assert(mism == 0L, s"$mism stream-vs-batch cells diverge through SQL")
    // and the streaming view composes with base tables like any other
    val joined = spark.sql(
      """SELECT count(*) AS n FROM graft_ev_ohlcv_stream o
        |JOIN events e ON e.event_type = o.event_type
        |  AND (e.ts div 1000) >= o.bucket_us
        |  AND (e.ts div 1000) < o.bucket_us + 3600000000""".stripMargin)
      .collect()(0).getLong(0)
    assert(joined > 0L)
  }
}
