package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Cross-validates the probabilistic dedup paths against the exact
  * n-gram Jaccard oracle on the sf0.001 documents table. */
class DedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables.documents(spark, dir)

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact jaccard finds the seeded near-duplicates") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash LSH recalls every exact-jaccard>=0.8 pair") {
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 32)
    val lsh = Dedup.minhashLshPairs(sigs, 32, 16, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exactPairs -- lsh
    assert(missed.isEmpty, s"LSH missed: $missed")
  }

  test("simhash hamming<=6 recalls most exact near-dup pairs") {
    // SimHash is a weaker signal than MinHash for word-multiset docs
    // drawn from a small vocabulary: a single swapped word can flip
    // many bits. >=80% recall at hamming<=6 is the expected operating
    // point; MinHash-LSH (exact recall above) is the primary dedup path.
    val sigs = Dedup.simhash(docs, col("text"), col("doc_id"))
    val sim = Dedup.simhashPairs(sigs, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactPairs & sim).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"simhash recall $recall, missed: ${exactPairs -- sim}")
  }

  test("exact dedup keeps one row per distinct text") {
    val out = Dedup.exactDedup(docs, col("text"), col("doc_id"))
    assert(out.count() == docs.select("text").distinct().count())
  }
}
