package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions
import graft.operators.Similarity

class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("graft_dot == higher-order fold, bit-exact, incl. SQL surface") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f))
    ).toDF("a", "b")
    val both = df.select(
      Similarity.dot(col("a"), col("b")).as("hof"),
      VectorExpressions.dot_product(col("a"), col("b")).as("native"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))

    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs")
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq == both.map(_.getDouble(0)).toSeq)
  }

  test("graft_srp == per-plane lshBucket composition, bit-exact") {
    VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = emb.select(
      org.apache.spark.sql.functions.array((0 until 4).map(t =>
        Similarity.lshBucket(col("embedding"), 6, 64, 42L + t)): _*).as("composed"),
      VectorExpressions.srp_buckets(col("embedding"), 6, 4, 64, 42L).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("null and empty arrays behave") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dot_product(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))      // null input -> null
    assert(out(1).getDouble(0) == 0.0) // empty -> 0
  }
}
