package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("jaccardTopK: hand-checked Jaccard, self excluded, k bound, no-shingle docs silent") {
    val docs = Seq(
      (1L, "a b c d e"), // query: shingles {abc, bcd, cde}
      (2L, "a b c d e"), // identical: inter 3, union 3 -> 1.0
      (3L, "a b c x y"), // shares {abc}: inter 1, union 5 -> 0.2
      (4L, "z z z z z"), // disjoint shingles -> absent
      (5L, "a b"), // under 3 words: no shingles -> absent
      (6L, "b c d q r") // shares {bcd}: inter 1, union 5 -> 0.2
    ).toDF("doc_id", "text")
    val out = Retrieval.jaccardTopK(docs, col("text"), col("doc_id"),
      Seq(1L), k = 2)
    val rows = out.orderBy("lex_rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // k=2 keeps the exact copy then the tie-broken 0.2 (doc 3 < doc 6)
    assert(rows.toSeq == Seq((2L, 1000000L, 1), (3L, 200000L, 2)))
    // no self row ever
    val all = Retrieval.jaccardTopK(docs, col("text"), col("doc_id"),
      Seq(1L), k = 10).collect()
    assert(all.forall(_.getLong(1) != 1L))
    assert(!all.map(_.getLong(1)).contains(4L))
    assert(!all.map(_.getLong(1)).contains(5L))
  }

  test("rrfFuse: integer contributions, absentees null, fused order total") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "doc_id", "lex_rnk")
    val sem = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q_id", "doc_id", "sem_rnk")
    val out = Retrieval.rrfFuse(lex, "lex_rnk", sem, "sem_rnk")
      .orderBy("rrf_rnk").collect()
    // doc 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522 -> rank 1
    // doc 10: 1e6/61 = 16393; doc 12: 1e6/62 = 16129
    assert(out.map(_.getLong(1)).toSeq == Seq(11L, 10L, 12L))
    assert(out(0).getLong(out(0).fieldIndex("rrf_um")) == 16393L + 16129L)
    // absentee columns are null, not zero ranks
    val d10 = out.find(_.getLong(1) == 10L).get
    assert(d10.isNullAt(d10.fieldIndex("sem_rnk")))
    val d12 = out.find(_.getLong(1) == 12L).get
    assert(d12.isNullAt(d12.fieldIndex("lex_rnk")))
    // equal-contribution tie breaks by doc_id: plant two single-list
    // docs at the same rank position in opposite lists
    val lex2 = Seq((2L, 21L, 1)).toDF("q_id", "doc_id", "lex_rnk")
    val sem2 = Seq((2L, 20L, 1)).toDF("q_id", "doc_id", "sem_rnk")
    val tie = Retrieval.rrfFuse(lex2, "lex_rnk", sem2, "sem_rnk")
      .orderBy("rrf_rnk").collect()
    assert(tie.map(_.getLong(1)).toSeq == Seq(20L, 21L))
  }

  test("jaccardTopK is repartition-invariant") {
    val docs = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${i % 5} tail$i"))
      .toDF("doc_id", "text")
    val a = Retrieval.jaccardTopK(docs, col("text"), col("doc_id"),
      Seq(0L, 1L), k = 5).collect().map(_.toSeq).toSet
    val b = Retrieval.jaccardTopK(docs.repartition(13), col("text"),
      col("doc_id"), Seq(0L, 1L), k = 5).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
