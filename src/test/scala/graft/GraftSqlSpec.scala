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
}
