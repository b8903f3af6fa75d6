package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Paths:
  *   - brute-force cosine top-k: exact baseline. Queries are broadcast;
  *     the corpus is scanned once, scored with codegen'd higher-order
  *     functions, and ranked per query. At 100 TB the corpus scan
  *     parallelizes perfectly (no shuffle until the tiny top-k agg).
  *   - LSH (sign-random-projection) bucketing: each vector hashes to a
  *     `bits`-bit signature; candidates share the query's bucket,
  *     reranked exactly. Sub-linear probe cost at scale.
  *
  * All math is double precision, left-to-right folds — bit-compatible
  * with the DuckDB oracle's `list_dot_product` on `DOUBLE[]`.
  */
object Similarity {

  /** Left-to-right dot product of two array<numeric> columns
    * (higher-order-function formulation; works on any session). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Same fold via the codegen'd native expression (graft_dot) —
    * identical arithmetic/order, tight primitive loop instead of
    * per-element lambda frames. Requires VectorExpressions.register
    * on the session (the top-k entry points below do this). */
  def nativeDot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    nativeDot(a, b) / (sqrt(nativeDot(a, a)) * sqrt(nativeDot(b, b)))

  /** Exact top-k cosine neighbors for each query row (small query set,
    * broadcast) against the corpus. Output: q_id, neighbor_id, cos_sim,
    * rnk (1-based). Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("qe")))
    val scored = corpus.crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"),
        col("rnk"))
  }

  /** Deterministic ±1 sign-random-projection hyperplanes (seeded). */
  private def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Per-table SRP bucket array for an embedding column — the shared
    * bucketing used by lshTopK and the LSH-fed near-dup path
    * (Dedup.embeddingNearDupPairsLsh). Element t is table t's bucket;
    * `posexplode` yields (tbl, bkt) pairs. Computed by the native
    * `graft_srp` expression: one codegen'd loop instead of
    * tables x bits expression trees per row (~2x on the LSH queries),
    * bit-identical values (same fold order / sign rule / seeding).
    * A NULL embedding yields a NULL bucket array, so posexplode DROPS
    * the row from every LSH path — intended: a row without an
    * embedding cannot be a similarity candidate (the old composed form
    * silently bucketed NULLs at 0; SimilaritySpec pins the drop). */
  def bucketArray(emb: Column, bits: Int, dim: Int, tables: Int,
      seed: Long = 42L): Column =
    graft.functions.VectorExpressions.srp_buckets(emb, bits, tables, dim, seed)

  /** `bits`-bit SRP-LSH bucket id for an embedding column (requires
    * VectorExpressions.register on the session — lshTopK does it). */
  def lshBucket(emb: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(bits, dim, seed)
    planes.zipWithIndex.map { case (p, j) =>
      val proj = nativeDot(emb, typedlit(p.toSeq))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** ANN top-k via multi-table SRP-LSH: `tables` independent `bits`-bit
    * signatures; a corpus row is a candidate if it shares any table's
    * bucket with the query, then candidates are reranked by exact
    * cosine. Recall/probe-cost is tuned by (bits, tables): clustered
    * real-world embeddings probe sub-linearly; on near-orthogonal data
    * (like the synthetic testdata, top-cos ~0.35) the same structure
    * degrades gracefully toward a larger candidate set. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int,
      dim: Int, tables: Int = 24, seed: Long = 42L,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    def bucketCols(emb: Column): Column = bucketArray(emb, bits, dim, tables, seed)
    // candidates are deduped as bare id pairs (narrow shuffle) and the
    // embedding payloads re-attached only for the final rerank — the
    // bucket join must not drag two 64-float arrays through the
    // dropDuplicates exchange
    val bucketed = Dedup.capBuckets(
      corpus.select(col("vec_id"),
        posexplode(bucketCols(col("embedding"))).as(Seq("tbl", "bkt"))),
      Seq("tbl", "bkt"), maxBucket)
    val qb = queries
      .select(col("vec_id").as("q_id"),
        posexplode(bucketCols(col("embedding"))).as(Seq("qtbl", "qbkt")))
    val candIds = bucketed.join(broadcast(qb),
        col("tbl") === col("qtbl") && col("bkt") === col("qbkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
      .dropDuplicates("q_id", "neighbor_id")
    val cand = candIds
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"))), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"),
        col("rnk"))
  }
}
