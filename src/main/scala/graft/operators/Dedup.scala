package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), word-n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale ladder (100 TB):
  *   - exact dedup: one shuffle on the content key — use a digest
  *     (`sha2`/`xxhash64`) as the group key so the shuffle carries 8-64
  *     bytes per row, not the document body;
  *   - pairwise n-gram Jaccard: exact but quadratic in the worst case —
  *     use only to verify candidates;
  *   - MinHash+LSH: the scale path — O(n) signatures, candidate pairs
  *     only where a band collides, then exact/estimated verification.
  *   - SimHash: 64-bit signature, candidates via 16-bit chunk bands
  *     (hamming<=k guarantee by pigeonhole with 4 chunks, k<=3 exact;
  *     wider k caught probabilistically).
  */
object Dedup {

  /** Exact dedup keep-list: one row per distinct text with the minimal
    * id as the keeper. The group key here is the content itself (exact
    * semantics); at 100 TB pre-hash to a digest column first so the
    * shuffle carries 8-64 B/row instead of the document body. */
  def exactDedup(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(text.as("__dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("__dedup_key")

  /** Exploded (id, shingle) pairs, shingles distinct per doc.
    *
    * Typed flatMap, not a higher-order-function expression: Catalyst's
    * CollapseProject inlines a projected `split(...)` into transform
    * lambdas (13 copies in the optimized plan), re-splitting the text
    * per element — O(words^2) per doc, measured ~10x slower than this
    * one-pass JVM tokenization. Same tokenization as the SQL oracle:
    * lowercase, single-space split keeping empties. */
  def explodeShingles(df: DataFrame, text: Column, id: Column, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .flatMap { case (did, t) =>
        val ws = t.split(" ", -1)
        if (ws.length < n) Iterator.empty
        else {
          val seen = scala.collection.mutable.HashSet.empty[String]
          ws.iterator.sliding(n).withPartial(false)
            .map(_.mkString(" "))
            .filter(seen.add)
            .map(s => (did, s))
        }
      }
      .toDF("doc_id", "s")
  }

  /** Exact pairwise n-gram Jaccard >= threshold, prefix-filtered
    * (AllPairs/PPJoin): under any global token order, two sets with
    * Jaccard >= t share a token within each one's first
    * `|A| - ceil(t|A|) + 1` tokens — so only those prefix tokens join.
    * Ordering tokens by ascending document frequency makes the prefixes
    * the RARE tokens, collapsing the join fanout that makes the naive
    * shingle join quadratic on hot shingles. Candidates then get an
    * exact intersection via `array_intersect` on the full (sorted,
    * deduped) shingle-id sets. Same results as the naive join — the
    * filter is lossless — at a fraction of the shuffle.
    *
    * Shingles are 64-bit ids (collision odds ~n_shingles^2/2^64).
    * Threshold prefix length uses exact integer arithmetic
    * (ceil(t*sz) = floorDiv(num*sz + den-1, den) for t = num/den).
    */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column, n: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact rational form of the threshold for the integer prefix-length
    // arithmetic (0.8 -> 4/5, 0.75 -> 3/4, ...)
    val bd = BigDecimal(threshold)
    require(bd > 0 && bd < 1 && bd.scale <= 6, s"threshold $threshold not in (0,1)")
    val den0 = BigInt(10).pow(bd.scale).toInt
    val num0 = (bd * den0).toIntExact
    val g = BigInt(num0).gcd(BigInt(den0)).toInt
    val (num, den) = (num0 / g, den0 / g)

    val sh = explodeShingles(df, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val tokDf = sh.groupBy("s").agg(count(lit(1)).as("tok_df"))

    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("tok_df").asc, col("s").asc)
    val prefix = sh.join(tokDf, "s")
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // L = sz - ceil(t*sz) + 1
      .filter(col("rn") <= col("sz") - floor((col("sz") * num + den - 1) / den) + 1)
      .select("doc_id", "s", "sz")

    // Length filter (also lossless): jaccard >= num/den forces
    // den*|A| >= num*|B| and vice versa (set sizes within a t factor).
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * den >= col("b.sz") * num &&
          col("b.sz") * den >= col("a.sz") * num)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()

    val sets = sh.groupBy("doc_id")
      .agg(collect_set(col("s")).as("toks"), count(lit(1)).as("sz"))
    val j = cand
      .join(sets.select(col("doc_id").as("a_id"), col("toks").as("ta"), col("sz").as("sa")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("toks").as("tb"), col("sz").as("sb")), "b_id")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", col("inter") / (col("sa") + col("sb") - col("inter")))
    j.filter(col("jaccard") >= threshold).select("a_id", "b_id", "jaccard")
  }

  /** MinHash signatures: `perms` min-hashes over 3-gram shingles, one
    * aggregation pass (doc_id, mh0..mh{perms-1}). One string hash per
    * shingle; permutations are a seeded affine universal family
    * `(a_i*h + b_i) mod (2^31-1)` on the 31-bit-masked hash — products
    * stay under 2^62 (no ANSI overflow) and the multiplicative mixing
    * keeps permutations effectively independent (a purely additive
    * `h1 + i*h2` family correlates minimizers across i — lower-envelope
    * effect — and measurably hurts recall). */
  def minhashSignatures(df: DataFrame, text: Column, id: Column,
      perms: Int, shingleN: Int = 3): DataFrame = {
    val P = 2147483647L // 2^31 - 1 (Mersenne prime)
    val rnd = new java.util.Random(42)
    val coeffs = Array.fill(perms)(
      (1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
    val sh = explodeShingles(df, text, id, shingleN)
      .withColumn("h", xxhash64(col("s")).bitwiseAND(lit(0x7FFFFFFFL)))
    val aggs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"mh$i")
    }.toSeq
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs from MinHash signatures: `bands` bands of
    * `rows = perms/bands` hashes; docs sharing any band hash become a
    * candidate; similarity is estimated as the matching-hash fraction.
    */
  def minhashLshPairs(signatures: DataFrame, perms: Int, bands: Int,
      estThreshold: Double): DataFrame = {
    val rows = perms / bands
    require(bands * rows == perms, "perms must divide into bands")
    val bandCols = (0 until bands).map { bidx =>
      struct(lit(bidx).as("bidx"),
        xxhash64((bidx * rows until (bidx + 1) * rows).map(i => col(s"mh$i")): _*)
          .as("bhash"))
    }
    val exploded = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.bidx").as("bidx"), col("band.bhash").as("bhash"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    val cand = a.join(b, col("a.bidx") === col("b.bidx") &&
        col("a.bhash") === col("b.bhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val simCols = (0 until perms)
      .map(i => when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(signatures.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(signatures.as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (simCols.cast("double") / perms).as("est_jaccard"))
      .filter(col("est_jaccard") >= estThreshold)
  }

  /** 64-bit SimHash over word hashes: bit b is 1 iff the sum of
    * (+1/-1) votes of that bit across word hashes is positive.
    * Votes accumulate per doc in a typed mapGroups pass (64 int
    * counters in a tight loop) — the 64-conditional-aggregate
    * formulation spends most of its time in expression evaluation. */
  def simhash(df: DataFrame, text: Column, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"),
        split(lower(text), " ").as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .withColumn("h", xxhash64(col("w")))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (did, rows) =>
        val votes = new Array[Int](64)
        rows.foreach { case (_, _, h) =>
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        (did, sig)
      }
      .toDF("doc_id", "simhash")
  }

  /** Embedding-cosine near-dup pairs (the embedding leg of the dedup
    * family): all pairs with cosine >= threshold. Brute-force here
    * (exact, oracle-checkable); at scale feed candidates from
    * Similarity.lshTopK buckets instead of the cross join. */
  def embeddingNearDupPairs(df: DataFrame, id: Column, emb: Column,
      threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    // Norms precomputed once per row: sqrt(dot(v,v)) is the identical
    // double whether computed per row or per pair, so this is a pure
    // 3x saving with unchanged (oracle-equal) results.
    val withNorm = df.select(id.cast("long").as("id"), emb.as("e"),
      sqrt(Similarity.nativeDot(emb, emb)).as("nrm"))
    val a = withNorm.select(col("id").as("a_id"), col("e").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos",
        Similarity.nativeDot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist via
    * 16-bit chunk banding (exact for maxDist <= 3 by pigeonhole). */
  def simhashPairs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("cidx"),
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("cval"))
    }
    val exploded = sigs.select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.cidx").as("cidx"), col("ch.cval").as("cval"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.cidx") === col("b.cidx") && col("a.cval") === col("b.cval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
