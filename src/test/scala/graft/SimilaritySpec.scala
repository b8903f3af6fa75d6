package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force top-k: k rows per query, self excluded, cos in [-1,1]") {
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
    val rows = bf.collect()
    assert(rows.length == 10 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("null embedding rows are dropped from LSH paths, not bucketed") {
    val spark0 = spark
    import spark0.implicits._
    val withNull = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((99999L, null: Array[Float])).toDF("vec_id", "embedding"))
    val cands = graft.operators.Dedup.lshCandidatePairs(withNull,
        col("vec_id"), col("embedding"), bits = 6, tables = 4, dim = 64)
      .filter(col("a_id") === 99999L || col("b_id") === 99999L)
    assert(cands.count() == 0)
    // and the bucket array itself is null, not zeros
    val arr = withNull.filter(col("vec_id") === 99999L)
      .select(graft.functions.VectorExpressions.srp_buckets(
        col("embedding"), 6, 4, 64, 42L))
      .collect()(0)
    assert(arr.isNullAt(0))
  }

  test("LSH top-k recalls a useful fraction of true neighbors") {
    val truth = pairSet(Similarity.bruteForceTopK(emb, queries, 5))
    // The synthetic embeddings are near-orthogonal (top cos ~0.35), the
    // hardest case for SRP-LSH; 24 tables x 6 bits targets ~0.7 recall
    // there, and far better on clustered real-world embeddings.
    val approx = pairSet(Similarity.lshTopK(emb, queries, 5, bits = 6, dim = 64))
    val recall = (truth & approx).size.toDouble / truth.size
    assert(recall >= 0.5, s"LSH recall@5 = $recall")
  }
}
