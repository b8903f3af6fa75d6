package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval: a lexical ranker (set-overlap Jaccard over word
  * shingles — the exact-match/BM25 family) and a semantic ranker
  * (embedding cosine) fused by Reciprocal Rank Fusion (Cormack,
  * Clarke & Büttcher 2009 — public knowledge). The standard RAG /
  * data-curation retrieval stack: lexical catches exact phrasing and
  * rare tokens, dense catches paraphrase; RRF needs no score
  * calibration between the two, only ranks.
  *
  * Beyond-reference surface (svoe has no retrieval); sits next to
  * `TextAnalysis.bm25TopK` and `Similarity.bruteForceTopK`.
  *
  * Determinism: Jaccard ranks on `inter*1e6 div union` (exact integer
  * floor division — never a rounded float), RRF on
  * `1e6 div (c + rank)` sums of integers; every window order carries
  * the id tiebreak. Cross-engine exact by construction.
  */
object Retrieval {

  /** Lexical top-k per query by exact shingle-set Jaccard. Queries are
    * a HANDFUL of probe documents (bounded metadata): their distinct
    * shingle sets are collected and BROADCAST, and the corpus is
    * scored in ONE typed flatMap — the corpus never shuffles its text;
    * only (q_id, doc_id, inter, union) candidate rows (docs sharing at
    * least one shingle) reach the per-query top-k window. The
    * decontaminate execution shape, with scores.
    *
    * At 100 TB: scan-bound; candidate volume is bounded by the
    * queries' shingle selectivity, and the rank window partitions by
    * q_id over candidates only. */
  def jaccardTopK(docs: DataFrame, text: Column, id: Column,
      queryIds: Seq[Long], k: Int, shingleN: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(id.cast("long").as("doc_id"),
      lower(text).as("t")).as[(Long, String)]
    val qIdSet = queryIds.toSet
    val qSets: Map[Long, Set[String]] = base
      .filter(r => qIdSet.contains(r._1))
      .collect()
      .map { case (d, t) => (d, shingleSet(t, shingleN)) }
      .toMap
    val bc = spark.sparkContext.broadcast(qSets)
    val cand = base.flatMap { case (d, t) =>
      val ds = shingleSet(t, shingleN)
      if (ds.isEmpty) Iterator.empty
      else bc.value.iterator.flatMap { case (qid, qs) =>
        if (qid == d || qs.isEmpty) Iterator.empty
        else {
          val inter = ds.count(qs.contains)
          if (inter == 0) Iterator.empty
          else Iterator.single(
            (qid, d, inter.toLong, (ds.size + qs.size - inter).toLong))
        }
      }
    }.toDF("q_id", "doc_id", "inter", "uni")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("jacc_um").desc, col("doc_id").asc)
    cand.withColumn("jacc_um", expr("inter * 1000000 div uni"))
      .withColumn("lex_rnk", row_number().over(w))
      .filter(col("lex_rnk") <= k)
      .select("q_id", "doc_id", "jacc_um", "lex_rnk")
  }

  /** The shingle-set convention shared with the dedup family: distinct
    * `n`-word shingles over a single-space split (docs under `n` words
    * have none). */
  private def shingleSet(t: String, n: Int): Set[String] = {
    val ws = (if (t == null) "" else t).split(" ", -1)
    if (ws.length < n) Set.empty
    else (0 to ws.length - n).iterator
      .map(i => ws.slice(i, i + n).mkString(" ")).toSet
  }

  /** Reciprocal Rank Fusion of two rank lists: full outer join on
    * (q_id, doc_id), each present rank contributing
    * `1e6 div (c + rank)` (exact integer), absentees 0; the fused rank
    * orders by (rrf_um DESC, doc_id). Output:
    * (q_id, doc_id, lex_rnk?, sem_rnk?, rrf_um, rrf_rnk) — rank
    * columns null where a list missed the doc. Output-linear in the
    * two lists (≤ 2k rows per query). */
  def rrfFuse(lex: DataFrame, lexRank: String, sem: DataFrame,
      semRank: String, c: Int = 60): DataFrame = {
    val l = lex.select(col("q_id"), col("doc_id"), col(lexRank))
    val r = sem.select(col("q_id"), col("doc_id"), col(semRank))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_um").desc, col("doc_id").asc)
    l.join(r, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_um",
        expr(s"CAST(coalesce(1000000 div ($c + $lexRank), 0) " +
          s"+ coalesce(1000000 div ($c + $semRank), 0) AS BIGINT)"))
      .withColumn("rrf_rnk", row_number().over(w))
  }
}
