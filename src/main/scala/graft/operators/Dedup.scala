package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), word-n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding near-dup (brute / LSH / SemDeDup / quantized-prefilter),
  * decontamination, passage dedup, survivor election, and the
  * INCREMENTAL family (exact / MinHash / SimHash verdicts against a
  * persistent index — the ingest-time path).
  *
  * Scale ladder (100 TB):
  *   - exact dedup: one shuffle on the content key — use a digest
  *     (`sha2`/`xxhash64`) as the group key so the shuffle carries 8-64
  *     bytes per row, not the document body;
  *   - pairwise n-gram Jaccard: exact but quadratic in the worst case —
  *     use only to verify candidates;
  *   - MinHash+LSH: the scale path — O(n) signatures, candidate pairs
  *     only where a band collides, then exact/estimated verification
  *     (pigeonhole-lossless when perms - ceil(t*perms) < bands);
  *   - SimHash: 64-bit signature, candidates via 8-bit chunk bands
  *     (hamming<=k exact by pigeonhole with 8 chunks for k<=7);
  *   - embedding near-dup: brute-force cosine as the exact baseline,
  *     SRP-LSH candidates + exact verify as the scale path, the
  *     lossless integer-quantized screen between them when candidate
  *     volume dominates;
  *   - incremental: never rescan the accepted corpus — verdicts join
  *     the new batch against a stored index (digests / signatures /
  *     banded signatures, bucket-stored so the index never
  *     re-shuffles).
  * Band joins take a hot-bucket cap (capBuckets) so degenerate band
  * values cannot generate quadratic candidate sets at scale.
  */
object Dedup {

  /** Base-hash family for the signature operators (MinHash shingle
    * hashing, SimHash word hashing). Two members:
    *
    *   - [[XxHash]] — catalyst xxhash64, seed 42: the library DEFAULT
    *     (fastest; bit-identical to the `xxhash64` Column function so
    *     typed-map signatures match any declarative twin).
    *   - [[Md5Prefix]] — the first 31/64 bits of md5: the
    *     ENGINE-PORTABLE choice. DuckDB replays it verbatim
    *     (`CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)`), so
    *     signature queries built on it get full SQL oracles (the
    *     doc_sample_hash md5-prefix trick); ~3x slower per string
    *     than xxhash64 — use for differential testing, not the
    *     100 TB path.
    *
    * `hash31` is the 31-bit-masked form the MinHash affine family
    * needs (products stay under 2^62); `hash64` the full-width form
    * SimHash votes on. */
  sealed trait BaseHash extends Serializable {
    def hash31(s: String): Long
    def hash64(s: String): Long
  }

  case object XxHash extends BaseHash {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def hash31(s: String): Long = hash64(s) & 0x7FFFFFFFL
    def hash64(s: String): Long =
      XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
  }

  case object Md5Prefix extends BaseHash {
    private def digest(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 md5 bytes big-endian (= first 8 hex chars), 31-bit mask
    def hash31(s: String): Long = {
      val d = digest(s)
      (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)) & 0x7FFFFFFFL
    }
    // first 8 md5 bytes big-endian as a SIGNED long (= the two-halves
    // hex parse the SQL twin uses)
    def hash64(s: String): Long = {
      val d = digest(s)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      h
    }
  }

  /** Exact dedup keep-list: one row per distinct text with the minimal
    * id as the keeper. Groups on a 256-bit digest of the content, not
    * the content itself, so the shuffle carries 32 B/row instead of the
    * document body (collision odds ~n^2/2^256 — nil at any corpus
    * size); semantics identical to grouping by text. */
  def exactDedup(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("__dedup_key"))
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
  /** The ONE tokenization+shingling rule every dedup path shares
    * (explodeShingles, minhashSignatures, the SQL/Python oracles):
    * single-space split keeping empties over ALREADY-lowercased text,
    * distinct n-gram shingles in first-occurrence order; null or
    * shorter-than-n docs yield nothing. Single-sourced so the
    * oracle-critical rule cannot drift between copies. */
  private[graft] def shingleIterator(t: String, n: Int): Iterator[String] = {
    val ws = if (t == null) Array.empty[String] else t.split(" ", -1)
    if (ws.length < n) Iterator.empty
    else {
      val seen = scala.collection.mutable.HashSet.empty[String]
      ws.iterator.sliding(n).withPartial(false)
        .map(_.mkString(" "))
        .filter(seen.add)
    }
  }

  def explodeShingles(df: DataFrame, text: Column, id: Column, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .flatMap { case (did, t) => shingleIterator(t, n).map(s => (did, s)) }
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
    * (ceil(t*sz) = (num*sz + den-1) div den for t = num/den, SQL
    * integral `div` — no floating point anywhere in the bound).
    *
    * The hashed shingle frame and the prefix frame are persisted:
    * the plan reads each of them from multiple branches (df counts,
    * prefix self-join, full sets) and would otherwise re-tokenize the
    * corpus 4x (measured: the tokenization MapPartitions dominated the
    * round-1 plan). The cached frames live until the caller drops them
    * (`spark.catalog.clearCache()` between queries in Verify/Bench) —
    * memory partitions LRU-evict under pressure, disk ones do not, so
    * long-lived sessions should clear between unrelated queries. */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column, n: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tokDf = sh.groupBy("s").agg(count(lit(1)).as("tok_df"))

    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("tok_df").asc, col("s").asc)
    val prefix = sh.join(tokDf, "s")
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // L = sz - ceil(t*sz) + 1
      .filter(col("rn") <= col("sz") - expr(s"(sz * $num + ${den - 1}) div $den") + 1)
      .select("doc_id", "s", "sz")
      .persist(StorageLevel.MEMORY_AND_DISK)

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

  /** CONTAINMENT near-dup pairs — quote/excerpt detection, the
    * asymmetric sibling of [[ngramJaccardPairs]]: symmetric Jaccard
    * misses a short document living whole inside a long one (the
    * intersection is small relative to the UNION), while containment
    * C(A,B) = |S_A ∩ S_B| / |S_A| flags it — the shape of quotation,
    * syndication, and excerpt duplication in web corpora.
    *
    * Computed over EVIDENCE shingles only: shingles with document
    * frequency <= `maxDf`. The cap is semantic AND structural at
    * once — a shingle shared by hundreds of documents is boilerplate,
    * not quotation evidence, and it is also the quadratic regime (a
    * df-D shingle fans into C(D,2) candidate pairs; Jaccard tames
    * this with prefix filtering, containment has no lossless
    * equivalent because the bound is asymmetric). Both the numerator
    * (shared) and the denominators (per-doc evidence-shingle counts)
    * live in the capped universe, so the ratio is self-consistent and
    * the SQL oracle replays the cap verbatim.
    *
    * Determinism: exact integer counts; containment as ppm by Long
    * floor division (`shared * 1e6 div sz`); pairs keyed a_id < b_id;
    * emitted when EITHER direction reaches `minContPpm` (the short
    * side is the interesting one, but the report shows both).
    *
    * 100 TB shape: one shingle explode (the shared
    * [[shingleIterator]] rule, 64-bit ids), one df agg, a df-capped
    * self-join whose fanout is <= maxDf per shingle — candidate
    * volume is df-bounded-linear in the corpus — and a map-side
    * combinable (a,b) count agg over bare long pairs. Docs shorter
    * than `n` words have no shingles and appear in no pair (the
    * Jaccard family's convention). */
  def containmentPairs(df: DataFrame, text: Column, id: Column, n: Int,
      maxDf: Int, minContPpm: Long): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sh = explodeShingles(df, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ev = sh
      .join(sh.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf), "s")
      .select("doc_id", "s")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = ev.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shared = ev.as("a")
      .join(ev.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), col("shared"),
        expr("shared * 1000000 div sa").as("cont_a_ppm"),
        expr("shared * 1000000 div sb").as("cont_b_ppm"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= minContPpm)
  }

  /** Per-document NOVELTY profile — the curation diagnostic between
    * exact dedup and near-dup: for each document, how much of its
    * content (distinct word n-gram shingles) appears HERE FIRST,
    * under the deterministic first-owner rule min(doc_id) per shingle
    * (ingestion order at a real pipeline; id order here). A replica
    * scores 0, fresh content 1e6, and syndication/quote-heavy docs
    * land in between — the per-doc number a selection policy
    * thresholds when near-dup pair volume is too blunt. Output:
    * (doc_id, n_shingles, n_novel, novelty_ppm); docs shorter than
    * `n` words have no shingles and no row (the Jaccard family's
    * convention).
    *
    * Determinism: exact integer counts, ppm by Long floor division,
    * first-owner by min — order-independent everywhere. 100 TB shape:
    * one shingle explode, one map-combinable min agg keyed by the
    * 64-bit shingle id, one shingle-keyed join back, one per-doc
    * count agg — every shuffled row is <= 24 bytes. */
  def noveltyProfile(df: DataFrame, text: Column, id: Column,
      n: Int): DataFrame = {
    val sh = explodeShingles(df, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val first = sh.groupBy("s").agg(min(col("doc_id")).as("first_id"))
    sh.join(first, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("first_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000000 div n_shingles").as("novelty_ppm"))
  }

  /** Test-set DECONTAMINATION: corpus documents sharing at least
    * `minShared` distinct word-n-gram shingles with ANY benchmark
    * document — the step a training pipeline runs against its eval
    * suites before training. Returns (doc_id, n_shared).
    *
    * 100 TB shape: the benchmark side is small by construction (eval
    * suites, not corpora), so its distinct shingle-hash set BROADCASTS
    * and the corpus-side match is a map-side semi join — the corpus is
    * never shuffled; only the (matched doc, count) pairs move in the
    * final per-doc aggregation. Shingles are the ONE shared
    * tokenization rule ([[shingleIterator]]), hashed to 64-bit ids. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, text: Column,
      id: Column, n: Int, minShared: Int): DataFrame = {
    val cs = explodeShingles(corpus, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val bs = explodeShingles(bench, text, id, n)
      .select(xxhash64(col("s")).as("h")).distinct()
    // shingles are distinct per doc, so count(*) after the semi-style
    // join IS the distinct shared-shingle count
    cs.join(broadcast(bs), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Same decontamination semantics with a Bloom-filter prefilter in
    * front of the exact check — the 100 TB formulation. The benchmark
    * shingle-hash set is folded into a Spark `BloomFilter`
    * (`df.stat.bloomFilter`, ~1.2 bytes/item at 1% fpp vs 8 bytes/item
    * for the exact hash set) and broadcast to every corpus task; the
    * bloom pass is a per-row JVM filter (no shuffle, no broadcast
    * join), and only bloom-PASSING corpus shingles — a tiny,
    * already-matched-or-false-positive subset — reach the exact join
    * that removes the false positives. Blooms have no false negatives,
    * so the output is IDENTICAL to [[decontaminate]] (same oracle);
    * the fpp knob trades broadcast bytes against confirm-join input.
    * The one driver-side action is `bench` shingle count for bloom
    * sizing — bounded: bench = eval suites, not corpora (same
    * assumption as the broadcast in [[decontaminate]]).
    * Reference semantics: svoe has no decontamination; this is
    * beyond-reference LLM-pipeline surface (SURVEY §2-adjacent). */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, text: Column,
      id: Column, n: Int, minShared: Int, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bs = explodeShingles(bench, text, id, n)
      .select(xxhash64(col("s")).as("h")).distinct()
    bs.persist() // read twice: bloom build + exact confirm
    val nBench = math.max(1L, bs.count())
    val bloom = bs.stat.bloomFilter("h", nBench, fpp)
    val bcBloom = spark.sparkContext.broadcast(bloom)
    val cs = explodeShingles(corpus, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)]
      .filter(r => bcBloom.value.mightContainLong(r._2))
      .toDF("doc_id", "h")
    // exact confirm kills the fpp*|corpus shingles| false positives;
    // the survivors side is small so AQE broadcasts it when apt
    val out = cs.join(bs, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    out
  }

  /** Per-SUITE contamination AUDIT — the report a pipeline publishes
    * before training: [[decontaminate]] answers "which corpus docs do
    * I drop"; this answers "which eval suite leaks, and how badly".
    * For every `suite` group in `bench`: the suite size
    * (n_bench_docs), the number of distinct corpus docs sharing >=
    * `minShared` distinct shingles with THAT suite's shingle set
    * (n_contaminated), and the total shared-shingle mass over those
    * docs (shared_shingles). Suites with no leaks report zeros.
    *
    * 100 TB shape: the bench side (eval suites) broadcasts exactly as
    * in [[decontaminate]] — the corpus is never shuffled; the only
    * moving rows are (doc, suite) match counts (bounded by matches,
    * not corpus size), and the final agg is suite-cardinality-sized. */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      text: Column, id: Column, suite: Column, n: Int,
      minShared: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // a suite's shingle SET: per-doc shingles are already distinct
    // (shingleIterator), the distinct() unions them across suite docs
    val bs = bench.select(suite.cast("string").as("suite"), lower(text).as("t"))
      .as[(String, String)]
      .flatMap { case (su, t) => shingleIterator(t, n).map(s => (su, s)) }
      .toDF("suite", "s")
      .select(col("suite"), xxhash64(col("s")).as("h")).distinct()
    val cs = explodeShingles(corpus, text, id, n)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val m = cs.join(broadcast(bs), "h")
      .groupBy(col("doc_id"), col("suite"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val per = m.groupBy("suite")
      .agg(count(lit(1)).as("n_contaminated"),
        sum(col("n_shared")).as("shared_shingles"))
    bench.select(suite.cast("string").as("suite"))
      .groupBy("suite").agg(count(lit(1)).as("n_bench_docs"))
      .join(per, Seq("suite"), "left")
      .select(col("suite"), col("n_bench_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("shared_shingles"), lit(0L)).as("shared_shingles"))
  }

  /** PASSAGE-level exact dedup (the within-and-across-document variant
    * of [[exactDedup]], a la the "dedup at paragraph granularity" step
    * of web-corpus pipelines): chunk each document into non-overlapping
    * `size`-word passages, keep only the FIRST corpus-wide occurrence
    * of each distinct passage — first in (doc_id, chunk_idx) order —
    * and reconstruct every document from its surviving passages.
    * Output: (doc_id, clean_text, n_kept, n_total); a fully-duplicate
    * document comes back with clean_text = '' and n_kept = 0.
    *
    * 100 TB shape: two shuffles, both narrow. (1) keeper election
    * groups passages by their sha2-256 digest with `min_by` on the
    * encoded (doc_id, chunk_idx) key — partial aggregation keeps one
    * candidate per digest per map task, so each passage body crosses
    * the wire at most once and losers die map-side; (2) reconstruction
    * regroups the surviving passages by doc_id — state bounded by
    * document length. Passage text is lowercased by the shared
    * chunker ([[TextAnalysis.chunkWords]] with stride = size).
    * Keeper order is the lexicographic struct (doc_id, chunk_idx) —
    * structs order field-by-field in both engines, so no encoded
    * arithmetic key (an earlier doc_id*1e6+idx encoding silently
    * overflowed for doc_id > ~9.2e12 and required idx < 1e6). */
  def paragraphDedup(df: DataFrame, text: Column, id: Column,
      size: Int): DataFrame = {
    val chunks = TextAnalysis.chunkWords(df, text, id, size, size)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
    val kept = chunks
      .groupBy(sha2(col("chunk"), 256).as("h"))
      // min over the struct = min_by (doc_id, chunk_idx): the pair is
      // unique per row, so the trailing chunk field never breaks ties
      .agg(min(struct(col("doc_id"), col("chunk_idx"), col("chunk"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.chunk_idx").as("chunk_idx"),
        col("k.chunk").as("chunk"))
    val totals = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_total"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_total"))
  }

  /** BOILERPLATE passage stripping — the CCNet/RefinedWeb "remove
    * lines repeated across many documents" step at passage
    * granularity. Where [[paragraphDedup]] keeps the FIRST occurrence
    * of every passage, this drops EVERY occurrence of a passage whose
    * document frequency reaches `minDf` (navigation chrome, cookie
    * banners, license footers — content that repeats across unrelated
    * documents is boilerplate, not information). Documents are
    * rebuilt from their surviving passages. Output: (doc_id,
    * clean_text, n_kept, n_boiler, n_total); a document that is pure
    * boilerplate comes back with clean_text = '' and n_kept = 0.
    *
    * 100 TB shape: the df aggregation ships (digest, doc_id) pairs —
    * 40 bytes per passage, never bodies — through a two-phase
    * count-distinct; the boilerplate digest set that survives
    * `minDf` is tiny by construction (high-df passages are few
    * distinct strings however many occurrences they have), so the
    * flag-back join broadcasts it and passage bodies never shuffle
    * for flagging; reconstruction then regroups only SURVIVING bodies
    * by doc_id — one body-width shuffle, state bounded by document
    * length. (A pathological corpus where nearly EVERY passage crosses
    * minDf — e.g. a pure replica set — inflates the broadcast toward
    * the distinct-passage count; measured fine at 5M docs
    * (SCALE.md), but drop the broadcast hint and let AQE decide if a
    * corpus is known to be replica-dominated.) Passage unit and lowercasing are the shared chunker's
    * ([[TextAnalysis.chunkWords]] with stride = size), so boilerplate
    * and first-occurrence dedup agree on what a passage is.
    * Reference anchor: svoe has no corpus operators; semantics follow
    * the public CCNet paragraph-hash discipline (Wenzek et al. 2020).
    */
  def boilerplateStrip(df: DataFrame, text: Column, id: Column,
      size: Int, minDf: Int): DataFrame = {
    require(size > 0 && minDf >= 2, s"bad boilerplate knobs ($size, $minDf)")
    val chunks = boilerplateChunks(df, text, id, size)
    val boiler = chunks
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h").as("bh"))
    boilerplateStripTail(chunks, boiler)
  }

  /** The shared passage frame of the boilerplate family: (doc_id,
    * chunk_idx, chunk, h=sha2(chunk)). */
  private[graft] def boilerplateChunks(df: DataFrame, text: Column,
      id: Column, size: Int): DataFrame =
    TextAnalysis.chunkWords(df, text, id, size, size)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        sha2(col("chunk"), 256).as("h"))

  /** [[boilerplateStrip]] against an EXTERNAL boilerplate digest set
    * (column `digest`) — the composition point for the streaming twin
    * (digest df accumulated by the state store, rebuild batch-side)
    * and for a persisted boilerplate index shared across ingest
    * batches. */
  def boilerplateStripAgainst(df: DataFrame, text: Column, id: Column,
      size: Int, boilerDigests: DataFrame): DataFrame =
    boilerplateStripTail(boilerplateChunks(df, text, id, size),
      boilerDigests.select(col("digest").as("bh")))

  private def boilerplateStripTail(chunks: DataFrame,
      boiler: DataFrame): DataFrame = {
    val flagged = chunks
      .join(broadcast(boiler), chunks("h") === boiler("bh"), "left")
      .withColumn("is_boiler", col("bh").isNotNull)
    // counts travel as (doc_id, is_boiler) — never bodies
    val totals = flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"))
    // only SURVIVING bodies reach the reconstruction shuffle
    val rebuilt = flagged.filter(!col("is_boiler"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_boiler"), col("n_total"))
  }

  /** INCREMENTAL exact dedup — the production shape: nobody re-dedups
    * the full corpus per ingest; the daily increment dedups against a
    * persistent digest INDEX. A new document survives iff (a) its
    * content digest is absent from the index (anti-join on the 32-byte
    * digest — the index side is a narrow digest column, never document
    * bodies) and (b) it wins the intra-batch keeper election among
    * same-digest new arrivals (min doc_id — the exactDedup rule).
    * Emits every new doc with its verdict + the blocking side
    * (`dup_of_index` vs a batch loser), so the caller can both filter
    * and audit.
    *
    * Scale shape: one digest map over the new batch (no shuffle), one
    * LEFT join against the index keyed on digest (the increment is
    * typically orders of magnitude smaller than the index — AQE
    * broadcasts the BATCH side when it fits, and the index is never
    * re-shuffled when stored bucketed by digest), one batch-sized
    * keeper aggregation. Index maintenance is the survivors' digests
    * appended — the same column this operator consumes. */
  def incrementalDedup(newDocs: DataFrame, text: Column, id: Column,
      indexDigests: DataFrame): DataFrame = {
    val keyed = newDocs.select(id.cast("long").as("doc_id"),
      sha2(text, 256).as("digest"))
    val idx = indexDigests.select(col("digest").as("idx_digest")).distinct()
    val keeper = keyed.groupBy("digest")
      .agg(min("doc_id").as("keep_id"))
    keyed
      .join(idx, keyed("digest") === idx("idx_digest"), "left")
      .join(keeper, "digest")
      .select(col("doc_id"), col("digest"),
        col("idx_digest").isNotNull.as("dup_of_index"),
        (col("idx_digest").isNull && col("doc_id") === col("keep_id"))
          .as("keep"))
  }

  /** Exact-substring duplicate detection via CONTENT-DEFINED anchors —
    * the suffix-array substring-dedup semantics (find long byte spans
    * repeated anywhere in the corpus) re-expressed shuffle-light.
    * Fixed-stride windows cannot work here: two copies of a substring
    * at different offsets sample misaligned windows and never collide.
    * Content-defined anchors fix that — a position is an anchor when
    * the polynomial hash of the next `w=8` chars (seeded fold
    * `acc*31+code`, no modulus: 8 chars stay under 2^63 — exact Int64
    * cross-engine) is ≡ 0 mod `density`; identical content therefore
    * produces identical anchor offsets in every copy, so any repeated
    * span long enough to contain an anchor+window is detected
    * regardless of alignment (the winnowing/CDC trick, deterministic —
    * no RNG, a pure function of the corpus).
    *
    * Emits per-doc `(doc_id, n_anchors, dup_anchors)` — dup mass, not
    * pairs: output-linear (the survivor-formulation rule). Scale shape:
    * one typed flatMap (zero shuffle) emits ~len/density anchors per
    * doc (~1.25 chars/char at L=40, density=32); one exchange groups
    * window digests (64-char sha2 hex here for oracle parity; at
    * 100 TB swap the group key to xxhash64 + exact-confirm join, the
    * Bloom-decontaminate shape); one exchange re-aggregates per doc.
    * Docs shorter than the window emit nothing (the lmScore rule). */
  def substrDupStats(df: DataFrame, text: Column, id: Column,
      winLen: Int = 40, hashW: Int = 8, density: Int = 32): DataFrame = {
    // hashW <= 10 keeps the no-modulus base-31 polynomial under 2^63
    // even for all-0xFFFF code units (65535*(31^w - 1)/30 < 2^63 iff
    // w <= 10): larger widths silently wrap in Scala while the DuckDB
    // oracle's BIGINT arithmetic errors — the cross-engine exactness
    // contract would break, so the width is a hard bound, not advice.
    require(hashW > 0 && hashW <= 10 && hashW <= winLen && density > 0,
      s"anchor hash width must be in [1, 10] and fit the window " +
        s"($winLen, $hashW, $density)")
    val spark = df.sparkSession
    import spark.implicits._
    val anchors = df.select(id.cast("long").as("doc_id"), text.as("t"))
      .as[(Long, String)]
      .flatMap { case (did, t) =>
        val s = if (t == null) "" else t
        val last = s.length - winLen // last 0-based window start
        (0 to last).iterator.filter { i =>
          var h = s.charAt(i).toLong
          var j = 1
          while (j < hashW) { h = h * 31 + s.charAt(i + j).toLong; j += 1 }
          h % density == 0
        }.map(i => (did, i + 1L, s.substring(i, i + winLen)))
      }
      .toDF("doc_id", "pos", "win")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupKeys = anchors.groupBy(sha2(col("win"), 256).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    anchors.join(dupKeys, sha2(col("win"), 256) === dupKeys("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("h").isNotNull, 1L).otherwise(0L)).as("dup_anchors"))
  }

  /** MinHash signatures: `perms` min-hashes over 3-gram shingles, one
    * aggregation pass (doc_id, mh0..mh{perms-1}). One string hash per
    * shingle; permutations are a seeded affine universal family
    * `(a_i*h + b_i) mod (2^31-1)` on the 31-bit-masked hash — products
    * stay under 2^62 (no ANSI overflow) and the multiplicative mixing
    * keeps permutations effectively independent (a purely additive
    * `h1 + i*h2` family correlates minimizers across i — lower-envelope
    * effect — and measurably hurts recall). */
  /** Repartition iff the frame's planned parallelism cannot fill the
    * session's cores — the single-row-group trap (r16 optimization):
    * parquet cannot split a row group, so a table written as one row
    * group scans as ONE task and every expensive per-row pass over it
    * (the typed signature maps below) runs single-threaded no matter
    * the cluster. The spread is DATA-ADAPTIVE, not a constant: a table
    * that already scans wide (any real multi-row-group table — the
    * 100 TB case) passes through untouched, so the exchange exists
    * exactly when the input cannot otherwise use the machine. Hash on
    * `key` (the docIdsSpread discipline — deterministic placement;
    * keyless round-robin would pay sortBeforeRepartition). Apply ONLY
    * in front of heavy NON-CODEGEN per-row work: for codegen'd
    * passes the exchange costs more than it buys (measured: shingle
    * explode + count 0.47 s plain vs 0.69 s spread; the minhash typed
    * map 0.50 s plain vs 0.29 s spread, sf0.1 warm). */
  private[graft] def spreadIfNarrow(df: DataFrame, key: Column): DataFrame = {
    // guard (r16 ADVICE): df.rdd below physically plans the fragment —
    // fine for a batch scan, AnalysisException on a streaming frame;
    // no current caller is streaming, but fail soft if one ever is
    if (df.isStreaming) return df
    // probe-only A/B valve (r17): lets a paired bench disable the
    // spread without a code edit; never set by Bench/Verify/the driver
    if (sys.env.get("GRAFT_SPREAD_DISABLE").contains("true")) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planned partition count — physical planning only, no job
    val planned = df.rdd.getNumPartitions
    if (planned * 2 < target) df.repartition(target, key) else df
  }

  def minhashSignatures(df: DataFrame, text: Column, id: Column,
      perms: Int, shingleN: Int = 3, baseHash: BaseHash = XxHash): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // Signatures are per-document: one typed map, zero shuffle (the
    // explode + 32-min-agg formulation exchanged every distinct
    // shingle). Same shingling, same catalyst-parity xxhash64 (seed
    // 42, 31-bit mask), same affine family — values unchanged
    // (DedupSpec pins vs the declarative form; the Python oracle
    // pins end-to-end). Docs with < shingleN words emit nothing,
    // matching the groupBy-over-empty-explode semantics.
    // spreadIfNarrow (r16): the map is the expensive non-codegen pass
    // of every minhash consumer; on a one-row-group scan it ran on one
    // core. Signatures are per-doc, so placement changes nothing.
    val spark = df.sparkSession
    import spark.implicits._
    val (as, bs) = minhashCoefficients(perms)
    val rows = spreadIfNarrow(
        df.select(id.cast("long").as("doc_id"), lower(text).as("t")),
        col("doc_id"))
      .as[(Long, String)]
      .flatMap { case (did, t) =>
        minhashSigOf(t, as, bs, shingleN, baseHash).map(mins =>
          org.apache.spark.sql.Row.fromSeq(did +: mins.toSeq)).iterator
      }(org.apache.spark.sql.Encoders.row(StructType(
        StructField("doc_id", LongType, nullable = false) +:
          (0 until perms).map(i => StructField(s"mh$i", LongType, nullable = false)))))
    rows.toDF()
  }

  /** The seeded affine permutation family shared by every minhash
    * consumer (batch signatures, the Python oracle, and the streaming
    * dedup twin) — deterministic in `perms` alone. */
  private[graft] def minhashCoefficients(perms: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(42)
    val as = new Array[Long](perms)
    val bs = new Array[Long](perms)
    (0 until perms).foreach { i =>
      as(i) = 1L + rnd.nextInt(Int.MaxValue - 1)
      bs(i) = rnd.nextInt(Int.MaxValue).toLong
    }
    (as, bs)
  }

  /** One document's minhash signature over ALREADY-LOWERCASED text (the
    * batch path lowers via the `lower` Column function; a non-SQL
    * caller must lower with `UTF8String.fromString(s).toLowerCase` for
    * byte parity, not Java's locale-sensitive `String.toLowerCase`).
    * None when the doc has fewer than `shingleN` words, matching the
    * groupBy-over-empty-explode shape. */
  private[graft] def minhashSigOf(rawLowered: String, as: Array[Long],
      bs: Array[Long], shingleN: Int,
      baseHash: BaseHash = XxHash): Option[Array[Long]] = {
    val P = 2147483647L // 2^31 - 1 (Mersenne prime)
    val perms = as.length
    val shingles = shingleIterator(rawLowered, shingleN)
    if (shingles.isEmpty) None
    else {
      val mins = Array.fill(perms)(Long.MaxValue)
      shingles.foreach { s =>
        val h = baseHash.hash31(s)
        var j = 0
        while (j < perms) {
          val v = (as(j) * h + bs(j)) % P // operands positive: % == pmod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      Some(mins)
    }
  }

  /** LSH candidate pairs from MinHash signatures: `bands` bands of
    * `rows = perms/bands` hashes; docs sharing any band hash become a
    * candidate; similarity is estimated as the matching-hash fraction.
    * `maxBucket` caps band-bucket size (hot-bucket guard, see
    * capBuckets) — a corpus of B identical docs otherwise makes every
    * band a B^2/2 candidate generator. */
  def minhashLshPairs(signatures: DataFrame, perms: Int, bands: Int,
      estThreshold: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    val rows = perms / bands
    require(bands * rows == perms, "perms must divide into bands")
    val bandCols = (0 until bands).map { bidx =>
      struct(lit(bidx).as("bidx"),
        xxhash64((bidx * rows until (bidx + 1) * rows).map(i => col(s"mh$i")): _*)
          .as("bhash"))
    }
    val exploded = capBuckets(
      signatures
        .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
        .select(col("doc_id"), col("band.bidx").as("bidx"), col("band.bhash").as("bhash")),
      Seq("bidx", "bhash"), maxBucket, col("doc_id"))
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

  /** INCREMENTAL near-dup against a signature index — the MinHash twin
    * of [[incrementalDedup]], for ingest pipelines that near-dedupe
    * each new batch against everything already accepted: new docs are
    * signed once (one typed map), band-joined against the index AND
    * against themselves, and each new doc gets a verdict row
    * (doc_id, dup_of_index, dup_of_batch_earlier, keep) — keep docs'
    * signatures are what the caller appends to the index (the same
    * frame family this operator consumes, the incrementalDedup
    * contract). Batch-internal duplicates resolve greedily by id (the
    * larger id defers): one-hop, order-deterministic, the standard
    * batch-parallel approximation of sequential arrival — EXACT
    * sequential semantics is a micro-batch loop, which is the
    * streaming dedup twin's job. Docs too short to sign (< shingleN
    * words) keep unconditionally, matching the signature operator's
    * empty-emit semantics.
    *
    * Exactness of the banding: with `rows = perms/bands` hashes per
    * band, a pair at estimate >= t has at most perms - ceil(t*perms)
    * unequal components, and each unequal component breaks at most one
    * band — so when perms - ceil(t*perms) < bands (true at the suite's
    * 32/16/0.6: 12 < 16) some band survives intact and the candidate
    * CANNOT be missed. Pigeonhole, not probability — the same argument
    * as the SimHash chunk-pair bands — which is what lets a SQL oracle
    * compare est over ALL pairs without replaying the banding.
    *
    * 100 TB shape: the index is never re-signed and never self-joined —
    * it enters only through the (bidx, bhash) band join, sharded by
    * band hash; with the index stored bucketed on (bidx, bhash) (the
    * BucketedStore contract) its side of the join never re-shuffles,
    * and per batch the exchange carries only the batch's banded rows
    * + matched index signatures. */
  /** The banded form of a MinHash signature frame: one (doc_id, bidx,
    * bhash) row per band — the exact exploded table the band join
    * consumes, exposed so a persistent index can store it ONCE,
    * bucketed on (bidx, bhash) (`BucketedStore`), and every future
    * batch's band join plans no exchange over the index
    * (BucketingSpec pins the plan). */
  /** One (doc_id, bidx, bhash) row per LSH band — band key = xxhash64
    * over the band's row-minima. NOTE on capping (r13, measured): the
    * 64-bit band keyspace cannot be concentrated by biased signature
    * bits, so unlike the 16-bit chunk bands the MinHash legs carry NO
    * default hot-bucket cap — on the probe corpus max band occupancy
    * is 13 of 5000 docs vs 458 for chunk bands (SCALE.md r13). Hot
    * MinHash buckets ARE replica clusters; route those through the
    * dedup-first sequencing, or the explicit maxBucket valve on
    * [[minhashLshPairs]]. */
  def minhashBands(sigs: DataFrame, perms: Int, bands: Int): DataFrame = {
    val rows = perms / bands
    require(bands * rows == perms, "perms must divide into bands")
    val bandCols = (0 until bands).map { bidx =>
      struct(lit(bidx).as("bidx"),
        xxhash64((bidx * rows until (bidx + 1) * rows).map(i => col(s"mh$i")): _*)
          .as("bhash"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.bidx").as("bidx"),
        col("band.bhash").as("bhash"))
  }

  def incrementalNearDup(newDocs: DataFrame, text: Column, id: Column,
      indexSigs: DataFrame, perms: Int = 32, bands: Int = 16,
      estThreshold: Double = 0.6, baseHash: BaseHash = XxHash,
      indexBands: Option[DataFrame] = None): DataFrame = {
    val bsig = minhashSignatures(newDocs, text, id, perms, 3, baseHash)
    def est(pa: String, pb: String): Column = (0 until perms)
      .map(i => when(col(s"$pa.mh$i") === col(s"$pb.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / perms
    val bb = minhashBands(bsig, perms, bands)
    // index-side frames carry DISTINCT column names so a plan reader
    // (and BucketingSpec's exchange grep) can attribute every exchange
    // to a side; simple aliases preserve the bucketed scan's reported
    // partitioning, so the renames cost nothing
    val ib = indexBands.getOrElse(minhashBands(indexSigs, perms, bands))
      .select(col("doc_id").as("i_id"), col("bidx").as("i_bidx"),
        col("bhash").as("i_bhash"))
    val isig = indexSigs.withColumnRenamed("doc_id", "idx_doc_id")
    val idxDup = bb.as("x")
      .join(ib, col("x.bidx") === col("i_bidx") &&
        col("x.bhash") === col("i_bhash"))
      .select(col("x.doc_id").as("n_id"), col("i_id")).distinct()
      .join(bsig.as("sa"), col("n_id") === col("sa.doc_id"))
      .join(isig.as("sb"), col("i_id") === col("sb.idx_doc_id"))
      .filter(est("sa", "sb") >= estThreshold)
      .select(col("n_id").as("doc_id")).distinct()
      .withColumn("dup_idx", lit(true))
    val selfDup = bb.as("x")
      .join(bb.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
      .join(bsig.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(bsig.as("sb"), col("b_id") === col("sb.doc_id"))
      .filter(est("sa", "sb") >= estThreshold)
      .select(col("b_id").as("doc_id")).distinct()
      .withColumn("dup_batch", lit(true))
    newDocs.select(id.cast("long").as("doc_id"))
      .join(idxDup, Seq("doc_id"), "left")
      .join(selfDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_idx"), lit(false)).as("dup_of_index"),
        coalesce(col("dup_batch"), lit(false)).as("dup_of_batch_earlier"),
        (!coalesce(col("dup_idx"), lit(false))
          && !coalesce(col("dup_batch"), lit(false))).as("keep"))
  }

  /** 64-bit SimHash over word hashes: bit b is 1 iff the sum of
    * (+1/-1) votes of that bit across word hashes is positive.
    *
    * SimHash is a per-document computation, so this is a single typed
    * map over (doc_id, text) — split, hash, and vote in one JVM pass
    * with ZERO shuffle (the round-1 explode+groupByKey formulation
    * shuffled every token of the corpus just to reassemble rows that
    * were never split across partitions; at 100 TB that shuffle is
    * proportional to total token count for no benefit). Word hashes
    * use catalyst's interpreted xxhash64 (seed 42) on UTF8String —
    * bit-identical to the `xxhash64` column function, so signatures
    * are unchanged from the round-1 implementation (DedupSpec pins). */
  def simhash(df: DataFrame, text: Column, id: Column,
      baseHash: BaseHash = XxHash): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .flatMap { case (did, t) =>
        // null text: no signature (the explode formulation's drop semantics)
        if (t == null) Iterator.empty
        else Iterator.single((did, simhashOf(t, baseHash)))
      }
      .toDF("doc_id", "simhash")
  }

  /** One document's simhash over ALREADY-LOWERCASED text (same lowering
    * contract as [[minhashSigOf]]). */
  private[graft] def simhashOf(lowered: String,
      baseHash: BaseHash = XxHash): Long = {
    val votes = new Array[Int](64)
    val ws = lowered.split(" ", -1)
    var i = 0
    while (i < ws.length) {
      val h = baseHash.hash64(ws(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
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
        Similarity.nativeDot(col("ea"), col("eb"))
          / nullif(col("na") * col("nb"), lit(0.0))) // zero-norm safe (ANSI)
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** [[embeddingNearDupPairs]] with a PROVABLY LOSSLESS scalar-quantized
    * prefilter: both sides carry int8-range codes of the normalized
    * vector (`graft_quantize`), every pair is first screened by the
    * exact integer dot of the codes (`graft_idot`), and only survivors
    * pay the double cosine that decides membership — so the output is
    * IDENTICAL to the float brute force (same oracle), while the
    * all-pairs inner loop runs on integers over 4x fewer bytes.
    *
    * The margin is a theorem, not a tuning knob: with q_i =
    * trunc(L*x_i) on the L2-normalized x, elementwise |L*x_i - q_i| < 1,
    * so |q.p - L^2*cos| <= 2*L*sqrt(d) + d; any pair with
    * cos >= threshold therefore has q.p >= ceil(L^2*threshold -
    * 2*L*sqrt(d) - d), and screening at that bound cannot drop a true
    * pair. At (L=127, d=64, t=0.9) the screen passes only pairs with
    * cos >= ~0.64 — the float path never sees the bulk. At 100 TB the
    * same screen drops unchanged into any candidate generator (LSH
    * buckets, SemDeDup clusters) between the pair join and the exact
    * verify. */
  def embeddingNearDupPairsQuantized(df: DataFrame, id: Column, emb: Column,
      threshold: Double, levels: Int = 127, dim: Int = 64): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    import graft.functions.VectorExpressions.{int_dot, quantize_vec}
    val minScore = math.ceil(levels.toDouble * levels * threshold
      - 2.0 * levels * math.sqrt(dim) - dim).toLong
    val withQ = df.select(id.cast("long").as("id"), emb.as("e"),
      sqrt(Similarity.nativeDot(emb, emb)).as("nrm"),
      quantize_vec(emb, levels).as("q"))
    val a = withQ.select(col("id").as("a_id"), col("e").as("ea"),
      col("nrm").as("na"), col("q").as("qa"))
    val b = withQ.select(col("id").as("b_id"), col("e").as("eb"),
      col("nrm").as("nb"), col("q").as("qb"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(int_dot(col("qa"), col("qb")) >= minScore)
      .withColumn("cos",
        Similarity.nativeDot(col("ea"), col("eb"))
          / nullif(col("na") * col("nb"), lit(0.0))) // zero-norm safe (ANSI)
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist via 8-bit
    * chunk banding. Pigeonhole: signatures within hamming d differ in
    * at most d of the 8 chunks, so for d <= 6 they agree on at least
    * TWO chunks, and for d = 7 on at least one. Band keys are chosen
    * accordingly:
    *
    *   - maxDist <= 3: FOUR disjoint chunk pairs (r12) — d corrupted
    *     chunks touch at most d <= 3 of them, one pair stays intact;
    *     exact at 1/7 the band rows of the C(8,2) set.
    *   - maxDist in [4, 6] (the suite's setting): all C(8,2)=28 ordered
    *     chunk PAIRS, 16-bit keys — still EXACT (some intact 2-chunk
    *     combo must match), but 65536 possible values per band instead
    *     of 256. This is the 100 TB-critical choice: with single 8-bit
    *     chunks, bucket occupancy is ~n/256 and the self-join grows
    *     QUADRATICALLY in corpus size regardless of how few true
    *     near-dups exist — measured 190x cost for 10x docs at the
    *     sf1-equivalent probe (SCALE.md). Pair-banding pays 3.5x more
    *     exploded 16-byte rows for ~256x finer buckets, restoring
    *     near-linear candidate growth to ~100x larger corpora.
    *   - maxDist == 7: single chunks (pairs would be lossy there).
    *
    * `maxBucket` is the hot-chunk guard: a degenerate band value
    * shared by B docs yields B^2/2 candidates; buckets above the cap
    * are subsampled to ~`maxBucket` expected members (md5 threshold,
    * see capBuckets) before the join.
    *
    * FORM SELECTION RULE (r13, measured — tools/SimhashSkewProbe): for
    * SELF-pair mining prefer [[simhashPairsBucketed]]. On the text
    * tier (radius 6, both forms capped at [[SimhashHotBucketCap]]) the
    * two forms measure within ±30% of each other across 100k/1M/5M
    * docs and clean/boilerplate regimes (join/bucketed wall ratio
    * 1.88, 2.65, 0.95, 1.29, 1.23, 0.98) — the capped candidate
    * volume, identical in both plans, is the binding cost, not the
    * plan form. What decides: REAL text-simhash populations are
    * extremely skewed (sf0.1 corpus: per-bit marginal |p-0.5| up to
    * 0.494, one band bucket holding 9.2% of all docs), and on such
    * populations the UNCAPPED join is the form that filled the disk at
    * 15M docs (SCALE.md r12) — the bucketed form is capped BY DEFAULT,
    * this form is unbounded by default. The join form remains the
    * right shape where the two sides differ (the incremental
    * index-vs-batch family: the index enters the plan only via the
    * band join, no collect_list of index buckets). */
  def simhashPairs(sigs: DataFrame, maxDist: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val exploded = capBuckets(simhashChunks(sigs, maxDist),
      Seq("cidx", "cval"), maxBucket, col("doc_id"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.cidx") === col("b.cidx") && col("a.cval") === col("b.cval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // verify BEFORE the dedup exchange: hamming is computed in the
      // join's projection (signatures ride the band rows), so filtering
      // first makes the distinct shuffle OUTPUT-sized — candidate
      // multiplicity (same pair from several chunk bands) never leaves
      // the map side. Identical output: hamming is pair-deterministic,
      // duplicates are identical rows.
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Default hot-bucket guard for [[simhashPairsBucketed]] (r13,
    * closing the r12 verdict's unbounded-default finding). Sized like
    * Similarity.KnnHotBucketCap but for popcount work instead of
    * cosine work: a full bucket costs C(4096,2) ≈ 8.4M xor+popcounts
    * in one task — tens of milliseconds — and holds 4096 (id, hash)
    * pairs ≈ 64 KB of heap, far under any task budget. Buckets above
    * it are md5-threshold-subsampled by capBuckets (deterministic,
    * oracle-replayable) rather than dropped. */
  val SimhashHotBucketCap: Int = 4096

  /** [[simhashPairs]] with IN-BUCKET scoring — IDENTICAL output
    * (spec-pinned equal), built for SKEWED hash populations. dHash/
    * SimHash bits are not independent (adjacent gradient bits share a
    * cell — a Markov chain, so a few chunk patterns are population-
    * heavy, the image analog of boilerplate), which makes the band
    * SELF-JOIN's input a sort of tables x corpus rows and its output
    * sum-of-bucket-squares pairs: the 15M-doc probe FILLED THE DISK in
    * sort spill before producing a row (SCALE.md r12). This variant is
    * the [[graft.operators.Similarity.knnGraph]] shape instead: ONE
    * exchange of bare (doc_id, simhash) rows into a per-capped-bucket
    * collect_list, pairs popcount-verified INSIDE the bucket group by
    * a streaming iterator — candidate pairs are never shuffled,
    * sorted, or joined; the only pair-sized thing in the plan is the
    * iterator, and only hamming <= maxDist survivors reach the
    * (output-sized) distinct exchange. Per-bucket work is
    * O(min(B, cap)^2) popcounts — bounded by the cap, embarrassingly
    * parallel across buckets. Same pigeonhole-exactness as
    * [[simhashPairs]] (identical banding).
    *
    * `maxBucket` DEFAULTS to [[SimhashHotBucketCap]], never unbounded:
    * unlike the join form (where an uncapped bucket merely inflates a
    * join), this form `collect_list`s each band bucket into one task's
    * heap, so a degenerate bucket (every doc sharing one boilerplate
    * band value) would materialize its whole membership in a single
    * task — exactly the failure the operator exists to prevent. Pass
    * `Int.MaxValue` explicitly to opt out (spec equality runs do). */
  def simhashPairsBucketed(sigs: DataFrame, maxDist: Int,
      maxBucket: Int = SimhashHotBucketCap): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val capped = capBuckets(simhashChunks(sigs, maxDist),
      Seq("cidx", "cval"), maxBucket, col("doc_id"))
    capped.groupBy(col("cidx"), col("cval"))
      .agg(collect_list(struct(col("doc_id").as("_1"),
        col("simhash").as("_2"))).as("m"))
      .select(col("m")).as[Array[(Long, Long)]]
      .flatMap { m0 =>
        // ids are unique within a bucket (one band row per doc), so
        // sorting by id makes every emitted pair (a < b) by position
        val m = m0.sortBy(_._1)
        val n = m.length
        new Iterator[(Long, Long, Int)] {
          private var i = 0
          private var j = 1
          private var nextPair: (Long, Long, Int) = _
          advance()
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && i < n - 1) {
              while (nextPair == null && j < n) {
                val d = java.lang.Long.bitCount(m(i)._2 ^ m(j)._2)
                if (d <= maxDist) nextPair = (m(i)._1, m(j)._1, d)
                j += 1
              }
              if (nextPair == null) { i += 1; j = i + 1 }
            }
          }
          def hasNext: Boolean = nextPair != null
          def next(): (Long, Long, Int) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("a_id", "b_id", "hamming")
      .distinct()
  }

  /** The chunk-pair band set for a Hamming radius — single-sourced for
    * the batch explode ([[simhashChunks]]) and BOTH streaming twins
    * (Streaming.simhashDedupStream / hashDedupStream): 4 DISJOINT
    * pairs for maxDist <= 3 (pigeonhole-exact at 1/7 the band rows),
    * all C(8,2) = 28 pairs for <= 6. */
  def chunkPairCombos(maxDist: Int): Array[(Int, Int)] = {
    require(maxDist <= 6, "chunk-pair banding is exact only to hamming 6")
    if (maxDist <= 3) Array.tabulate(4)(i => (2 * i, 2 * i + 1))
    else (for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)).toArray
  }

  /** The chunk-pair band VALUE of a signature for combo (i, j) — the
    * scalar twin of [[simhashChunks]]'s Column expression (chunk i in
    * the high byte, chunk j low), single-sourced for the streaming
    * legs (Streaming.simhashDedupStream / hashDedupStream) so the bit
    * layout cannot drift from the batch explode; DedupSpec pins the
    * Column-vs-scalar equality. */
  def chunkPairVal(sig: Long, i: Int, j: Int): Long =
    (((sig >>> (i * 8)) & 0xFFL) << 8) | ((sig >>> (j * 8)) & 0xFFL)

  /** One packed bucket key per (band idx, band value) — the streaming
    * engine's composite state key. cval occupies 16 bits (a
    * [[chunkPairVal]]), so idx << 16 is collision-free across bands. */
  def packBandKey(idx: Int, cval: Long): Long = idx.toLong << 16 | cval

  /** The chunk-band form of a SimHash signature frame — one (doc_id,
    * simhash, cidx, cval) row per band key from [[chunkPairCombos]]'s
    * tier rule (4 disjoint 16-bit chunk pairs for maxDist <= 3, all
    * C(8,2) pairs for 4..6, single 8-bit chunks for 7): the exploded
    * table the simhash band join consumes, exposed so a persistent
    * index can store it bucketed on (cidx, cval) — the
    * [[minhashBands]] story for the hamming family. */
  def simhashChunks(sigs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 7, s"8-chunk banding is exact only to hamming 7, got $maxDist")
    def chunkOf(c: Int) =
      shiftrightunsigned(col("simhash"), c * 8).bitwiseAND(0xFFL)
    val chunks =
      if (maxDist <= 6) {
        // tier rule lives in chunkPairCombos: 4 DISJOINT chunk pairs
        // for d <= 3 (d corrupted chunks touch at most 3 of 4 disjoint
        // pairs, so one survives intact — pigeonhole-EXACT at 4 band
        // rows per doc; the 7x row cut keeps banding affordable on
        // POPULATION-SKEWED hashes like dHash, where band-row volume,
        // not bucket width, is the binding cost — the 15M-doc phash
        // probe, SCALE.md r12), all 28 pairs only for d in [4, 6].
        chunkPairCombos(maxDist).toSeq.zipWithIndex.map { case ((i, j), idx) =>
          struct(lit(idx).as("cidx"),
            (shiftleft(chunkOf(i), 8).bitwiseOR(chunkOf(j))).as("cval"))
        }
      } else (0 until 8).map { c =>
        struct(lit(c).as("cidx"), chunkOf(c).as("cval"))
      }
    sigs.select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.cidx").as("cidx"), col("ch.cval").as("cval"))
  }

  /** INCREMENTAL near-dup against a SIMHASH index — [[incrementalNearDup]]
    * for the hamming-distance family: new docs are signed in one typed
    * map, chunk-band-joined against the index and themselves, verdicts
    * by popcount(xor) <= maxDist. Banding is pigeonhole-exact for
    * maxDist <= 6 (at most 6 differing chunks leave >= 2 intact, so an
    * intact chunk PAIR must collide — the simhashPairs theorem), which
    * is why the SQL oracle can compare hamming over ALL pairs with no
    * banding replay. Signatures ride the band rows, so the verdict
    * needs no signature re-join — the index enters the plan ONLY via
    * the (cidx, cval) join; store [[simhashChunks]] bucketed on those
    * keys and the index never re-shuffles. Unsignable docs (null text)
    * keep unconditionally. */
  def incrementalNearDupSimhash(newDocs: DataFrame, text: Column, id: Column,
      indexSigs: DataFrame, maxDist: Int = 6, baseHash: BaseHash = XxHash,
      indexChunks: Option[DataFrame] = None,
      maxBucket: Int = SimhashHotBucketCap): DataFrame =
    incrementalNearDupHashes(simhash(newDocs, text, id, baseHash),
      indexSigs, maxDist, indexChunks,
      // null-text docs have no signature row but still keep
      // unconditionally: the verdict universe is ALL new docs
      universe = Some(newDocs.select(id.cast("long").as("doc_id"))),
      maxBucket = maxBucket)

  /** [[incrementalNearDupSimhash]] over PRECOMPUTED 64-bit Hamming
    * signatures — the perceptual-media leg of the incremental family
    * (what [[Streaming.hashDedupStream]]'s precomputed-signature leg
    * is to the streaming twins): the caller has already decoded media
    * and hashed it (image dHash / DCT hash, audio fingerprint), and
    * this supplies the index-vs-batch verdict. Both frames are
    * (doc_id, simhash). The index enters the plan ONLY via the
    * (cidx, cval) band join (the join form — the shape the r13
    * self-pair rule explicitly keeps for two-sided legs); signatures
    * ride the band rows, so no signature re-join. `universe`
    * (optional) is the verdict frame — docs present there but absent
    * from `batchSigs` (unsignable) keep unconditionally.
    *
    * `maxBucket` caps BOTH sides' band buckets (r13): perceptual and
    * text-simhash populations are corpus-measured SKEWED (SCALE.md
    * r13 stage A), so a hot band value holds O(corpus) rows on the
    * index side AND O(batch) rows on the batch side, and the join's
    * candidate volume for that one value is their PRODUCT — the
    * self-join blowup, squared corpus sizes swapped for index x
    * batch. The default is the family guard; the cap cannot trip
    * below `maxBucket` docs sharing one band value, so grading-scale
    * results are exact. Pass Int.MaxValue to opt out. */
  /** Distinct batch doc_ids within `maxDist` of ANY index signature —
    * the INDEX leg of [[incrementalNearDupHashes]], factored out so
    * the streaming composition's per-micro-batch fold
    * ([[graft.streaming.Streaming.hashDedupIncrementalStream]]) joins
    * the SAME plan shape against the same stored band table: batch
    * sigs explode to chunk bands, both sides capBuckets-guarded, one
    * (cidx, cval) join, popcount verify, bare-id distinct. Store
    * `indexChunks` bucketed on (cidx, cval) and the index side never
    * re-shuffles. */
  def hashIndexDupIds(batchSigs: DataFrame, indexChunks: DataFrame,
      maxDist: Int, maxBucket: Int = SimhashHotBucketCap,
      indexPrefilter: Boolean = false): DataFrame = {
    val bchunks = simhashChunks(batchSigs, maxDist)
    val bb = capBuckets(bchunks, Seq("cidx", "cval"), maxBucket, col("doc_id"))
    // INDEX-SIDE VALUE PRUNING — built, measured, DEFAULT OFF (r15).
    // The r14 amortization decade named "skip index band data a
    // batch's band values cannot touch" as the next lever; this is
    // that lever as a broadcast LEFT-SEMI of the index against the
    // batch's distinct (cidx, cval) keys. It is EXACT (whole index
    // groups removed atomically, so capBuckets' surviving counts —
    // and therefore verdicts — are unchanged even in the capped
    // regime; BucketingSpec pins equality), always broadcast-safe
    // (key space bounded at bands x 2^16), and preserves the
    // bucketed scan's no-exchange property. But on SKEW-MODELED
    // perceptual-hash populations it is a measured LOSS at every
    // realistic batch size (IncrementalScaleProbe, 50M index,
    // SCALE.md r15): row mass concentrates in the hot slots every
    // batch touches — a 1M batch hits 24% of slots holding 99.7% of
    // rows, a 10k batch 3.8% of slots holding 88.1% — so <= 12% of
    // the join feed is ever prunable while the semi pass itself is
    // paid once per consumption of this frame (capBuckets reads it
    // twice). Alternated walls: OFF 19-30 s vs ON 45-56 s at both
    // batch sizes. FILE-level variants die earlier still (the 16-bit
    // saturation math, SCALE.md r15). Opt in only for hash families
    // whose band-value population is near-uniform AND whose batches
    // are small — there selectivity is ~(touched slots / 65536) per
    // band and can actually bite. The levers that DO pay on skewed
    // populations: file-count hygiene (BucketedStore.compactBuckets,
    // measured ~2x recovery after 10 appends) and the hot-bucket cap.
    val ibSrc =
      if (!indexPrefilter) indexChunks
      else indexChunks.join(
        // one banding pass: the broadcast key set derives from the SAME
        // bchunks frame as the batch side above — re-banding batchSigs
        // here doubled the batch pass on a path already measured
        // marginal (r15 ADVICE)
        broadcast(bchunks.select(col("cidx"), col("cval")).distinct()),
        Seq("cidx", "cval"), "left_semi")
    val ib = capBuckets(ibSrc, Seq("cidx", "cval"), maxBucket,
        col("doc_id"))
      .select(col("doc_id").as("i_id"), col("simhash").as("i_sim"),
        col("cidx").as("i_cidx"), col("cval").as("i_cval"))
    bb.as("x")
      .join(ib, col("x.cidx") === col("i_cidx") &&
        col("x.cval") === col("i_cval"))
      .select(col("x.doc_id").as("doc_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("i_sim"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_id")).distinct()
  }

  /** What [[bandSkewAdvisor]] measured on a stored band index.
    * `slots` = occupied (cidx, cval) keys (bounded at bands x 2^16);
    * `meanRowsPerSlot` = rows / slots — the cheap one-pass signal the
    * SCALE.md r15 rule names (`approx_count_distinct` against the row
    * count); `topShare` = the fraction of index ROWS held by the top
    * `topFraction` of slots by row count — the discriminator the 50M
    * probe actually measured (skew-modeled populations: 88-99.7% of
    * rows in the slots every batch touches; unbiased sigs: no hot
    * mass, 763 rows/slot uniformly). `recommendPrefilter` applies the
    * measured regime rule. */
  final case class BandSkewReport(slots: Long, rows: Long,
      meanRowsPerSlot: Double, p99RowsPerSlot: Long, maxRowsPerSlot: Long,
      topShare: Double, recommendPrefilter: Boolean)

  /** The r15 prefilter decision rule AS CODE (r15 verdict #4): should
    * [[hashIndexDupIds]]' `indexPrefilter` be on for THIS stored
    * index? The measured law (SCALE.md r15, 50M-doc probe, both
    * regimes): value pruning pays iff rows-per-slot is near-uniform —
    * on skew-modeled hash populations the hot slots hold 88-99.7% of
    * rows and every batch touches them (<= 12% of the join feed ever
    * prunable, ON ~2x slower); on unbiased populations no slot is hot
    * (top 1% of slots hold ~1% of rows) and the broadcast left-semi
    * prunes ~86% of the index scan (ON wins the alternation at both
    * probe batch sizes). The rule here: recommend ON iff the top
    * `topFraction` of slots hold <= `maxTopShare` of rows.
    *
    * Cost: one groupBy over the band key space (bounded at bands x
    * 2^16 slots — metadata-sized by construction) + one top-k pass
    * over the slot-count frame; run it once per stored index, at
    * build or compaction time, not per batch. The verdict is advisory
    * — exactness holds with the prefilter on OR off (BucketingSpec);
    * only the wall clock is at stake. */
  def bandSkewAdvisor(indexChunks: DataFrame, topFraction: Double = 0.01,
      maxTopShare: Double = 0.10): BandSkewReport = {
    require(topFraction > 0 && topFraction <= 1 && maxTopShare > 0,
      s"bad advisor knobs ($topFraction, $maxTopShare)")
    val counts = indexChunks.groupBy("cidx", "cval")
      .agg(count(lit(1)).as("c"))
      .persist()
    try {
      val s = counts.agg(count(lit(1)).as("slots"), sum("c").as("rows"),
          max("c").as("mx"),
          expr("percentile(c, 0.99)").cast("long").as("p99"))
        .collect()(0)
      val (slots, rows, mx, p99) =
        (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      val topK = math.max(1L, math.ceil(slots * topFraction).toLong)
      val topRows = counts.orderBy(col("c").desc, col("cidx"), col("cval"))
        .limit(topK.toInt).agg(sum("c")).collect()(0).getLong(0)
      val topShare = topRows.toDouble / rows
      BandSkewReport(slots, rows, rows.toDouble / slots, p99, mx,
        topShare, recommendPrefilter = topShare <= maxTopShare)
    } finally { counts.unpersist(); () }
  }

  def incrementalNearDupHashes(batchSigs: DataFrame, indexSigs: DataFrame,
      maxDist: Int, indexChunks: Option[DataFrame] = None,
      universe: Option[DataFrame] = None,
      maxBucket: Int = SimhashHotBucketCap,
      indexPrefilter: Boolean = false): DataFrame = {
    val idxDup = hashIndexDupIds(batchSigs,
        indexChunks.getOrElse(simhashChunks(indexSigs, maxDist)),
        maxDist, maxBucket, indexPrefilter)
      .withColumn("dup_idx", lit(true))
    // self-pair mining INSIDE the batch is exactly the case the r13
    // form rule routes through the in-bucket form (simhashPairsBucketed
    // — identical output, same capBuckets keep set): the join form here
    // consumed the capped batch band frame TWICE more (a self-join),
    // re-running the cap aggregate+join per consumption — the r14 A/B
    // attributed doc_dedup_incremental_simhash's 1.4x-vs-control delta
    // to those recomputed cap passes (SCALE.md r14). The index leg
    // stays the two-sided join — the shape the form rule keeps.
    val selfDup = simhashPairsBucketed(batchSigs, maxDist, maxBucket)
      .select(col("b_id").as("doc_id")).distinct()
      .withColumn("dup_batch", lit(true))
    universe.getOrElse(batchSigs).select(col("doc_id"))
      .join(idxDup, Seq("doc_id"), "left")
      .join(selfDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_idx"), lit(false)).as("dup_of_index"),
        coalesce(col("dup_batch"), lit(false)).as("dup_of_batch_earlier"),
        (!coalesce(col("dup_idx"), lit(false))
          && !coalesce(col("dup_batch"), lit(false))).as("keep"))
  }

  /** Connected components over an undirected pair list: every node in
    * the graph gets the MINIMUM id reachable from it as its canonical
    * cluster id — the step that turns near-dup PAIRS into dedup groups
    * (keep one doc per component). Min-label propagation: each round
    * every node takes the min label among itself and its neighbors;
    * the fixpoint is unique, so the result is deterministic under any
    * partitioning. Execution is the GraphX-Pregel shape: edges are
    * hash-partitioned once and every per-round join is co-partitioned,
    * so each round pays ONE shuffle (the message reduceByKey), with
    * per-round persist/unpersist keeping the session flat (driver-side
    * is only the convergence count). Lineage grows O(rounds) between
    * the persisted parents — rounds = O(graph diameter), tiny for
    * duplicate clusters; at web-graph diameters switch to the
    * large-star/small-star alternation and add periodic checkpoints. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    // RDD loop, GraphX-Pregel style: iterative label propagation is
    // the one genuinely iterative algorithm here, and the RDD API
    // gives the two things the loop needs that DataFrames don't:
    // per-round EXPLICIT unpersist (a localCheckpoint-per-round
    // formulation leaked checkpoint blocks that clearCache cannot
    // free — measured 3-20x slowdowns on every later query in the
    // bench session) and no Catalyst re-analysis of a growing plan.
    //
    // The pair graph is usually FAR smaller than the corpus it came
    // from (near-dup pairs, not documents), so the partitioner is
    // sized to the measured edge count — ~100k symmetric edges per
    // partition, capped at defaultParallelism — instead of blindly
    // using 32 partitions: each round is a multi-stage job over every
    // partition, and at oracle scale (hundreds of edges) 32-partition
    // rounds are pure task-scheduling overhead (measured: dominates
    // the query's wall time). The raw edge RDD is persisted BEFORE the
    // sizing count so the upstream pair computation (an expensive
    // similarity join) runs once, then re-partitioned and dropped.
    val raw = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count()
    val part = new org.apache.spark.HashPartitioner(
      math.min(sc.defaultParallelism, (nEdges / 100000L).toInt + 1))
    // symmetric edge list, hash-partitioned ONCE — every join below is
    // then co-partitioned (narrow); only the message reduceByKey
    // shuffles per round
    val edges = raw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.mapValues(_ => ()).reduceByKey(part, (_, _) => ())
      .mapPartitions(_.map { case (id, _) => (id, id) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materializes edges too; raw is now droppable
    raw.unpersist(blocking = false)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      // convergence is counted by an accumulator INSIDE the round's
      // map, so each round runs exactly ONE action (the materializing
      // count) with no separate old-vs-new comparison join. Task
      // retries can only over-count the accumulator (a retried task
      // re-adds), never under-count a successful change — so the loop
      // can at worst run one redundant round, never stop early.
      val acc = sc.longAccumulator("cc_label_changes")
      // the edge list is symmetric, so keying by the FIRST endpoint and
      // sending its label to the second covers both directions
      val neighborMin = edges.join(labels) // co-partitioned: narrow
        .map { case (_, (dst, label)) => (dst, label) }
        .reduceByKey(part, math.min(_: Long, _: Long)) // the round's one shuffle
      val next = labels.leftOuterJoin(neighborMin) // co-partitioned
        .mapValues { case (l, nl) =>
          val m = math.min(l, nl.getOrElse(l))
          if (m < l) acc.add(1L)
          m
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // the round's single action; fills acc
      changed = acc.value
      labels.unpersist(blocking = false)
      labels = next
    }
    val out = labels.toDF("id", "component")
      .localCheckpoint() // one final cut so callers don't re-run the loop
    labels.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    lastRounds = rounds
    out
  }

  /** Rounds the last connected-components call took — observability for
    * SCALE.md's diameter-vs-rounds record and the equivalence specs
    * (min-label = O(diameter) rounds, large-star/small-star = O(log n)).
    * Test/diagnostic use only. */
  @volatile private[graft] var lastRounds: Int = -1

  /** Connected components via large-star/small-star alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — public algorithm): converges in O(log n) rounds
    * regardless of graph DIAMETER, where min-label propagation
    * ([[connectedComponents]]) needs O(diameter) rounds — the variant
    * to use when components can be long chains (link graphs, record
    * linkage), not the tight near-dup clusters dedup produces.
    *
    * Both operations are expressed as reduceByKey(min) + co-partitioned
    * join rather than groupByKey, so no node's full neighbor list is
    * ever materialized — a hub node at web scale would OOM a
    * groupByKey formulation.
    *   - large-star: every node u sends min(N(u) ∪ {u}) to its
    *     STRICTLY LARGER neighbors — attaches big ids to the local min
    *     without ever growing a node's smallest edge;
    *   - small-star: every node u (edges directed larger→smaller)
    *     re-points its smaller neighbors and itself at its minimum
    *     smaller neighbor — flattens chains into stars.
    * The fixpoint is the star forest {(v, component-min)}: equal output
    * to [[connectedComponents]] (property-tested on random graphs).
    * Convergence check is an exact symmetric difference (two
    * co-partitioned subtracts per round — affordable because rounds are
    * O(log n)); lineage is cut every `checkpointEvery` rounds with a
    * localCheckpoint whose blocks the caller frees session-wide
    * (Bench/Verify unpersist all persistent RDDs between queries). */
  def connectedComponentsLargeStar(pairs: DataFrame,
      checkpointEvery: Int = 8): DataFrame = {
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext

    val raw = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].rdd
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a > b) (a, b) else (b, a) } // canonical hi→lo
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = raw.count()
    val part = new org.apache.spark.HashPartitioner(
      math.min(sc.defaultParallelism, (nEdges / 100000L).toInt + 1))

    // (v, m) for v > u, m = min(N(u) ∪ {u}): reduceByKey gives each
    // node's min neighbor; the join re-walks edges to address the
    // strictly-larger endpoints. Both directions participate.
    def largeStar(e: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      val both = e.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
        .partitionBy(part)
      val minNbr = both.reduceByKey(part, math.min(_: Long, _: Long))
      // NO distinct here: each directed edge emits exactly one pair, so
      // duplicates are rare ((u,v) multiplicity only), smallStar's
      // reduceByKey(min) tolerates them, and its trailing distinct
      // restores the set property the convergence check relies on —
      // dropping this dedup saves one full shuffle per round (measured
      // ~40% off the query: 5.1->3.1s sf0.1, 56->34s sf10eq chains).
      both.join(minNbr) // co-partitioned: narrow
        .flatMap { case (u, (v, mn)) =>
          if (v > u) Iterator((v, math.min(mn, u))) else Iterator.empty
        }
    }

    // edges already directed hi→lo: m = min smaller-neighbor of u;
    // re-point every smaller neighbor (and u itself) at m.
    def smallStar(e: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      val dir = e.partitionBy(part)
      val minNbr = dir.reduceByKey(part, math.min(_: Long, _: Long))
      dir.join(minNbr) // co-partitioned: narrow
        .flatMap { case (u, (v, mn)) =>
          if (v != mn) Iterator((v, mn)) else Iterator.empty
        }
        .union(minNbr) // (u, mn) — u re-points too; mn < u always
        .distinct(part.numPartitions)
    }

    var edges = raw
    var edgesCount = nEdges
    var prevPersisted: RDD[(Long, Long)] = raw
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      var next = smallStar(largeStar(edges))
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (rounds % checkpointEvery == 0) next = next.localCheckpoint()
      // EXACT convergence at one action most rounds: both sides are
      // distinct sets, so |next| != |edges| proves change with just the
      // materializing count; only when the counts agree does one
      // subtract (co-partitioned) decide — subset + equal cardinality
      // == set equality. (The old symmetric difference paid two
      // subtracts + a union EVERY round.)
      val nextCount = next.count()
      changed =
        if (nextCount != edgesCount) 1L
        else next.subtract(edges).count()
      edgesCount = nextCount
      prevPersisted.unpersist(blocking = false)
      prevPersisted = next
      edges = next
    }
    // fixpoint is the star forest (v, componentMin) — add the roots
    val out = edges.flatMap { case (v, m) => Iterator((v, m), (m, m)) }
      .distinct(part.numPartitions)
      .toDF("id", "component")
      .localCheckpoint()
    prevPersisted.unpersist(blocking = false)
    lastRounds = rounds
    out
  }

  /** Output-LINEAR survivor formulation for near-dup dedup — the 100 TB
    * OUTPUT shape. Materialized PAIR sets are quadratic in cluster
    * sizes by definition (the sf1-equivalent probe measured 3,700x pair
    * growth for 10x docs on a dup-heavy corpus — the cost is the
    * answer), and no pipeline keeps pairs: it keeps one doc per
    * cluster. pairs -> [[connectedComponents]] -> keep = (component
    * label == own id); docs in no pair keep trivially. Output is
    * EXACTLY one row per input doc — (doc_id, keep, component) with a
    * null component for untouched docs — linear in the corpus no
    * matter how duplicate-heavy it is. The pair frame stays an
    * internal shuffled edge list, never driver-materialized. */
  def survivors(df: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
      .select(col("id").as("__sid"), col("component").as("component"))
    df.select(id.cast("long").as("doc_id"))
      .join(cc, col("doc_id") === col("__sid"), "left")
      .select(col("doc_id"),
        (col("component").isNull || col("component") === col("doc_id"))
          .as("keep"),
        col("component"))
  }

  /** QUALITY-KEEPER survivor election — [[survivors]] with the
    * production election rule: per duplicate cluster keep the
    * BEST-scored document (ties -> lowest doc_id), not the lowest id.
    * A web-corpus pipeline keeps the cleanest copy of each near-dup
    * family, not the first-crawled one; min-id election is only right
    * when copies are byte-identical. `score` must be an INTEGER-exact
    * column (the qualityDecimicro discipline — never a rounded double)
    * so the election is deterministic and cross-engine replayable;
    * null scores rank below every real score (the election negates
    * the score for the struct-min arg-min, so scores must sit above
    * Long.MinValue — any bounded integer key like qualityDecimicro's
    * [0, 10000] qualifies). Output is one row per input doc —
    * (doc_id, keep, component, kept_by), component and kept_by null
    * for docs in no pair.
    *
    * Scale shape: identical to [[survivors]] plus one component-keyed
    * election agg (cardinality <= doc count; carries (score, id)
    * pairs, never text) and one re-join on component. Output-linear
    * regardless of dup density. */
  def survivorsBest(df: DataFrame, id: Column, score: Column,
      pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
      .select(col("id").as("__sid"), col("component"))
    // null score -> -1: qualityDecimicro is in [0, 10000], so every
    // real score outranks a degenerate (null-quality) doc
    val scored = df.select(id.cast("long").as("doc_id"),
      coalesce(score.cast("long"), lit(-1L)).as("__score"))
    val withComp = scored.join(cc, col("doc_id") === col("__sid"), "left")
      .select(col("doc_id"), col("__score"), col("component"))
    // min over the struct = arg_min (-score, doc_id): max score, tie
    // to the lowest id — one shuffle at component cardinality
    val elect = withComp.filter(col("component").isNotNull)
      .groupBy("component")
      .agg(min(struct((-col("__score")).as("s"), col("doc_id").as("d"))).as("e"))
      .select(col("component").as("__ec"), col("e.d").as("__keep"))
    withComp.join(elect, col("component") === col("__ec"), "left")
      .select(col("doc_id"),
        (col("component").isNull || col("doc_id") === col("__keep"))
          .as("keep"),
        col("component"), col("__keep").as("kept_by"))
  }

  /** MinHash-LSH keep-list: [[minhashSignatures]] ->
    * [[minhashLshPairs]] -> [[survivors]] — the recommended end-to-end
    * scale path for signature dedup (SCALE.md). */
  def minhashSurvivors(df: DataFrame, text: Column, id: Column, perms: Int,
      bands: Int, estThreshold: Double, maxBucket: Int = Int.MaxValue,
      baseHash: BaseHash = XxHash): DataFrame = {
    val sigs = minhashSignatures(df, text, id, perms, baseHash = baseHash)
    survivors(df, id, minhashLshPairs(sigs, perms, bands, estThreshold, maxBucket))
  }

  /** SimHash keep-list: [[simhash]] -> [[simhashPairsBucketed]] ->
    * [[survivors]] — the in-bucket form per the r13 self-pair rule
    * (see [[simhashPairs]]); r13 also fixed `maxBucket` being silently
    * dropped (it was never forwarded to the pair miner) and gave it
    * the family's capped default. */
  def simhashSurvivors(df: DataFrame, text: Column, id: Column, maxDist: Int,
      maxBucket: Int = SimhashHotBucketCap,
      baseHash: BaseHash = XxHash): DataFrame =
    survivors(df, id,
      simhashPairsBucketed(simhash(df, text, id, baseHash), maxDist, maxBucket))

  /** Bits of md5 prefix the hot-bucket keep rule thresholds on: 6 hex
    * chars = 24 bits keeps the Long product `hash * bucket_size`
    * overflow-free up to 2^39 rows in ONE bucket (beyond any plausible
    * degenerate bucket) while quantizing the keep probability at
    * 2^-24 — sub-percent of cap even at cap 512 over a 10^9-row
    * bucket. */
  private[graft] val KeepHashBits = 24

  /** The ONE hot-bucket keep predicate (r12, rank-free): row survives
    * its bucket iff
    *
    *   `hv * bucket_size < cap * 2^24`,  hv = first 6 md5 hex chars of
    *   the row's sample key, parsed base-16 (uniform on [0, 2^24))
    *
    * i.e. an md5-threshold subsample whose expected kept count is the
    * cap. Properties the capped operators rely on:
    *
    *   - under-cap buckets pass WHOLE: bsz <= cap forces
    *     hv·bsz < 2^24·bsz <= 2^24·cap for every hv < 2^24;
    *   - deterministic and partitioning-independent (pure function of
    *     the key and the bucket size — no RNG, no sort, no window), so
    *     the SQL oracle replays it verbatim ([[md5KeepSql]]) and a
    *     rerun keeps the identical set;
    *   - monotone in cap: kept(cap1) ⊆ kept(cap2) for cap1 <= cap2;
    *   - a key appearing in several buckets is judged per bucket
    *     (bucket sizes differ), but within one bucket family a shared
    *     size gives coherent verdicts across bands — an all-identical
    *     corpus keeps the SAME ~cap member sample in every band.
    *
    * Unlike the pre-r12 `row_number` rank (keep the cap-smallest md5
    * prefixes), the kept count in a hot bucket is binomial with mean
    * cap rather than exactly cap — the price for removing the
    * per-bucket single-task sort a degenerate bucket would funnel
    * through one core at 100 TB (the r11 verdict's scale finding). */
  private[graft] def md5Keeps(sampleKey: Column, bucketSize: Column,
      cap: Int): Column =
    conv(substring(md5(sampleKey.cast("string")), 1, 6), 16, 10)
      .cast("long") * bucketSize.cast("long") <
      lit(cap.toLong << KeepHashBits)

  /** DuckDB twin of [[md5Keeps]] — splice into an oracle's WHERE with
    * the key/bucket-size SQL expressions. Single-sourced here so the
    * engine rule and every replay stay textually coupled. */
  private[graft] def md5KeepSql(keyExpr: String, bszExpr: String,
      cap: Int): String =
    s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 6)) " +
      s"AS BIGINT) * ($bszExpr) < ${cap.toLong << KeepHashBits}"

  /** Hot-bucket guard for LSH band joins: (band, hash) buckets holding
    * more than `maxBucket` rows are SUBSAMPLED to ~`maxBucket`
    * expected members by the [[md5Keeps]] threshold rule. So one
    * degenerate band value (all-identical docs, an adversarial hash
    * collision, a boilerplate chunk) still cannot produce more than a
    * ~cap^2/2 candidate set, but a saturated bucket degrades to a
    * uniform content-hash sample of itself instead of vanishing — an
    * anchor in a hot bucket keeps ~cap candidates rather than zero
    * (drop-bucket measured recall@5 0.45 at 20M vectors / 27% capped
    * rows; SCALE.md).
    *
    * Plan shape (r12): ONE lazy plan — a bucket-size aggregate
    * filtered to the over-cap buckets, left-joined back, rows kept by
    * `__bsz IS NULL OR md5Keeps` — no driver action, no persist (the
    * pre-r12 eager count leaked its cached size table, r11 verdict
    * finding #1), and NO per-bucket sort: the rank-based keep funneled
    * a degenerate bucket's whole row set through one task, this
    * filter is embarrassingly parallel. The hot-size side is
    * hot-bucket-count-sized (<= n/cap rows), so AQE broadcasts it in
    * the common case; use [[graft.operators.Similarity.cappedBucketStats]]
    * for cap-pressure observability (the old code path's warn log). */
  private[graft] def capBuckets(exploded: DataFrame, keys: Seq[String],
      maxBucket: Int, sampleKey: Column): DataFrame =
    if (maxBucket == Int.MaxValue) exploded
    else {
      CapObserver.register(exploded.sparkSession)
      // "no silent caps" (r13 ADVICE): the hot-size aggregate already
      // enumerates every over-cap bucket, so a CollectMetrics node ON
      // THAT TINY SIDE (one row per hot bucket — never the exploded
      // row stream) makes a tripped cap loud at zero hot-path cost:
      // CapObserver's listener WARNs with the bucket count and the
      // expected drop volume whenever a completed action saw > 0.
      val hotSizes = exploded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") > maxBucket)
        .observe(CapObserver.nextName(),
          count(lit(1)).as("hot_buckets"),
          coalesce(sum(col("__bsz") - maxBucket), lit(0L))
            .as("rows_over_cap"))
      exploded.join(hotSizes, keys, "left")
        .filter(col("__bsz").isNull ||
          md5Keeps(sampleKey, col("__bsz"), maxBucket))
        .drop("__bsz")
    }

  /** Session listener behind the capBuckets "no silent caps" metric:
    * every capped plan carries a uniquely-named observe() on its
    * hot-bucket-size side, and one QueryExecutionListener per session
    * prints a warning whenever a completed action observed a tripped
    * cap — recall loss from md5-threshold subsampling is now visible
    * at run time (r13 ADVICE: the capped default was silent). stdout,
    * not stderr: sbt prefixes stderr with [error] (drain-sweeper
    * lesson). */
  private[graft] object CapObserver {
    private val seq = new java.util.concurrent.atomic.AtomicLong()
    private val registered =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def nextName(): String = s"graft_cap_${seq.incrementAndGet()}"
    // sessionUUID, not identityHashCode (r14 ADVICE): a recycled
    // identity hash would silently skip registering the listener for
    // a NEW session; dead tokens are swept so the set stays bounded
    def register(spark: org.apache.spark.sql.SparkSession): Unit = {
      registered.removeIf(t => graft.core.Sessions.dead(t))
      if (registered.add(graft.core.Sessions.token(spark)))
        spark.listenerManager.register(
          new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                durationNs: Long): Unit =
              qe.observedMetrics.foreach { case (name, row) =>
                if (name.startsWith("graft_cap_") &&
                    row.getAs[Long]("hot_buckets") > 0L)
                  println(s"[graft] $name: hot-bucket cap tripped — " +
                    s"${row.getAs[Long]("hot_buckets")} bucket(s) over cap, " +
                    s"~${row.getAs[Long]("rows_over_cap")} rows subsampled " +
                    "away (md5-threshold keep; raise maxBucket for exactness)")
              }
            override def onFailure(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                exception: Exception): Unit = ()
          })
    }
  }

  /** Embedding near-dup pairs via SRP-LSH candidates + exact cosine
    * verification — the scale path for `embeddingNearDupPairs` (same
    * output schema; equal output whenever every >=threshold pair
    * collides in at least one table). The per-pair miss probability is
    * (1 - p^bits)^tables with p = 1 - acos(cos)/pi: at a realistic
    * near-dup threshold (cos 0.9, bits=8, tables=8) that is <1e-4 with
    * n/256 expected bucket sizes; on the near-orthogonal synthetic
    * testdata (threshold 0.35, p~0.61) exactness needs the wide
    * bits=2/tables=32 setting, which degenerates toward all-pairs —
    * a property of thresholding noise-level similarity, not of the
    * operator (measured ratios in SCALE.md). Candidates are deduped
    * as bare id pairs before the embedding payloads are re-attached. */
  /** SRP-LSH candidate id pairs for embedding near-dup detection: rows
    * sharing any table's bucket, emitted as bare (a_id, b_id) pairs —
    * the candidate stage that embeddingNearDupPairsLsh feeds to exact
    * verification (public so candidate-set size is measurable —
    * SCALE.md reports the ratios).
    *
    * Dedup is `distinct()` over the bare id-pair multiset — the
    * map-side partial aggregate collapses most multiplicity before the
    * exchange, and the shuffled rows are 16 bytes. A "min matching
    * table" formulation that avoids the dedup shuffle entirely (carry
    * both bucket vectors through the join, filter pairs that already
    * matched an earlier table with exists/zip_with/slice) was measured
    * 9x SLOWER here: the higher-order lambdas allocate two sliced
    * arrays per joined row — the CollapseProject/HOF trap again
    * (CLAUDE.md). If the dedup exchange ever dominates at cluster
    * scale, that filter needs a custom codegen'd Expression, not HOFs. */
  def lshCandidatePairs(df: DataFrame, id: Column, emb: Column,
      bits: Int, tables: Int, dim: Int, seed: Long = 42L,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val bucketed = capBuckets(
      df.select(id.cast("long").as("id"),
        posexplode(Similarity.bucketArray(emb, bits, dim, tables, seed))
          .as(Seq("tbl", "bkt"))),
      Seq("tbl", "bkt"), maxBucket, col("id"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** `quantizedScreen = true` inserts the lossless integer screen of
    * [[embeddingNearDupPairsQuantized]] between the candidate join and
    * the double cosine: candidate rows carry int8-range codes, pairs
    * failing `graft_idot >= ceil(L^2 t - 2L sqrt(d) - d)` die before
    * any float math. The margin theorem guarantees no true pair is
    * screened out, so the output is IDENTICAL either way (spec-pinned);
    * the screen only changes which rows pay the exact verify — the
    * right default once candidate volume, not bucketing, dominates. */
  def embeddingNearDupPairsLsh(df: DataFrame, id: Column, emb: Column,
      threshold: Double, bits: Int = 2, tables: Int = 32, dim: Int = 64,
      seed: Long = 42L, maxBucket: Int = Int.MaxValue,
      quantizedScreen: Boolean = false): DataFrame = {
    // IN-BUCKET verify (round 8, the knnGraph shape): candidates are
    // scored inside each capped bucket group and only VERIFIED pairs
    // (cos >= threshold) leave the fold — the pair-materialized form
    // (id-pair distinct + two corpus-sized payload re-joins) shuffled
    // and sorted candidate volume, which is the disk cliff the kNN
    // probe hit at 2M vectors. The distinct here runs on verified
    // pairs only: OUTPUT-sized by definition of the operator. A pair
    // colliding in several tables re-verifies once per table — the
    // explicit trade: redundant 64-dim dots are cheap, pair-sized
    // exchanges are not. The screen (lossless integer margin, see
    // [[embeddingNearDupPairsQuantized]]) rides the exploded rows as
    // code arrays and kills non-candidates before any float math,
    // exactly as it did between the join and the verify.
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.quantize_vec
    val levels = 127
    val screen = quantizedScreen
    val minScore =
      if (!screen) Long.MinValue
      else math.ceil(levels.toDouble * levels * threshold
        - 2.0 * levels * math.sqrt(dim) - dim).toLong
    val thr = threshold
    val exploded0 = df.select(id.cast("long").as("id"), emb.as("e"),
      posexplode(Similarity.bucketArray(emb, bits, dim, tables, seed))
        .as(Seq("tbl", "bkt")))
    val exploded =
      if (screen) exploded0.withColumn("q", quantize_vec(col("e"), levels))
      else exploded0.withColumn("q", lit(null).cast("array<bigint>"))
    capBuckets(exploded, Seq("tbl", "bkt"), maxBucket, col("id"))
      .groupBy(col("tbl"), col("bkt"))
      .agg(collect_list(struct(col("id").as("_1"), col("e").as("_2"),
        col("q").as("_3"))).as("ms"))
      .select(col("ms")).as[Array[(Long, Array[Float], Array[Long])]]
      .flatMap { m =>
        // LAZY pair iterator (the knnGraph rule): a hot bucket on a
        // dup-heavy corpus verifies O(cap^2) pairs and most PASS the
        // threshold — buffering them per group OOM'd the heap at the
        // fourth-decade probe. Yield one verified pair at a time.
        val n = m.length
        val norms = new Array[Double](n)
        var p = 0
        while (p < n) {
          norms(p) = math.sqrt(Similarity.dotD(m(p)._2, m(p)._2)); p += 1
        }
        new Iterator[(Long, Long, Double)] {
          private var i = 0
          private var j = 1
          private var nxt: (Long, Long, Double) = null
          private def advance(): Unit = {
            while (nxt == null && i < n - 1) {
              if (m(i)._1 != m(j)._1 &&
                  (!screen || Similarity.idotD(m(i)._3, m(j)._3) >= minScore)) {
                val den = norms(i) * norms(j)
                // den == 0: a zero vector has no direction (the old
                // form's NULL cos), never a near-dup
                if (den != 0.0) {
                  val cos = Similarity.dotD(m(i)._2, m(j)._2) / den
                  if (cos >= thr) {
                    nxt =
                      if (m(i)._1 < m(j)._1) (m(i)._1, m(j)._1, cos)
                      else (m(j)._1, m(i)._1, cos)
                  }
                }
              }
              j += 1
              if (j >= n) { i += 1; j = i + 1 }
            }
          }
          def hasNext: Boolean = { if (nxt == null) advance(); nxt != null }
          def next(): (Long, Long, Double) = {
            if (!hasNext) throw new NoSuchElementException
            val t = nxt; nxt = null; t
          }
        }
      }
      .toDF("a_id", "b_id", "cos")
      .distinct()
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Seed centroids for [[semanticDedupPairs]]: the `nClusters` corpus
    * vectors with the smallest (md5(id), id) — Sampling.hashSample's
    * content-hash selection rule applied to cluster seeding, so the
    * seed set is deterministic, partition-order-free, and replayable
    * in ANSI SQL (md5 hex is identical cross-engine; the driver oracle
    * re-picks the same seeds). Collected to the driver: index METADATA
    * (nClusters x dim doubles), not data. Cluster index = seed rank in
    * that order. */
  def semanticSeeds(df: DataFrame, id: Column, emb: Column,
      nClusters: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.orderBy(md5(id.cast("string")).asc, id.asc).limit(nClusters)
      .select(emb).as[Array[Float]]
      .collect().map(_.map(_.toDouble))
  }

  /** SemDeDup — semantic near-dup pairs via cluster-then-search (the
    * SemDeDup recipe of Abbas et al. 2023, arXiv:2303.09540): assign
    * every vector to its max-cosine centroid, then run the exact
    * pairwise cosine search ONLY within each cluster. This is what
    * makes embedding-level dedup tractable at 100 TB: with k balanced
    * clusters the pair volume is sum_i c_i^2 ~ n^2/k instead of n^2,
    * and k must scale with the corpus (SCALE.md's bucket-space rule —
    * clusters ARE the buckets here). The trade is explicit and
    * structural: pairs split across clusters are missed by
    * construction; near-identical vectors always co-cluster (identical
    * inputs produce identical scores, ties break to the lowest
    * cluster), so the high-similarity regime the operator exists for
    * is structurally safe.
    *
    * Plan shape: centroids broadcast (metadata); one typed map assigns
    * clusters (zero shuffle); ONE corpus shuffle on cluster id feeds
    * the within-cluster self-join; `maxCluster` is the hot-bucket
    * guard ([[capBuckets]] on `lst`). `iters` > 0 refines seeds with
    * Lloyd rounds (Similarity.refineLloyd — the quality path, spec'd);
    * iters = 0 keeps the raw md5-picked seeds, where every score is a
    * fixed-order double fold and the whole operator is exactly
    * reproducible in SQL — the driver-oracled regime
    * (emb_semdedup_pairs / emb_semdedup_survivors).
    *
    * Output: (a_id, b_id, lst, cos_sim 6dp) — co-clustered pairs with
    * exact cosine >= threshold; `lst` is the shared cluster index. */
  def semanticDedupPairs(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, threshold: Double, iters: Int = 0,
      maxCluster: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val centroids = Similarity.refineLloyd(
      df.select(id.cast("long").as("vec_id"), emb.as("embedding")),
      semanticSeeds(df, id, emb, nClusters), iters)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = df.select(id.cast("long").as("id"), emb.as("e"))
      .as[(Long, Array[Float])]
      .map { case (i, e) => (i, e, Similarity.nearestList(bc.value, e)) }
      .toDF("id", "e", "lst")
    val capped = capBuckets(assigned, Seq("lst"), maxCluster, col("id"))
      // norms hoisted per row (oracle-equal; see embeddingNearDupPairs)
      .select(col("id"), col("lst"), col("e"),
        sqrt(Similarity.nativeDot(col("e"), col("e"))).as("nrm"))
    val a = capped.select(col("id").as("a_id"), col("lst"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = capped.select(col("id").as("b_id"), col("lst").as("lstb"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("lst") === col("lstb") && col("a_id") < col("b_id"))
      .withColumn("cos",
        Similarity.nativeDot(col("ea"), col("eb"))
          / nullif(col("na") * col("nb"), lit(0.0))) // zero-norm safe (ANSI)
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("lst"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Deterministic cluster ASSIGNMENT — the SemDeDup front half as a
    * first-class operator (topic bucketing for cluster-balanced
    * sampling, per-topic corpus stats, mixture grouping): md5-seeded
    * centroids ([[semanticSeeds]], optionally Lloyd-refined),
    * broadcast, then ONE typed map assigns each vector its max-cosine
    * list (ties to the lowest index — the [[semanticDedupPairs]]
    * rule, SQL-replayable at iters=0). Output (vec_id, lst).
    *
    * 100 TB shape: centroids are k x dim metadata on the driver
    * (k = [[autoClusters]] ∝ n but targetPerCluster-sized payload);
    * the assignment is a zero-shuffle map right after the scan. */
  def semanticClusters(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centroids = Similarity.refineLloyd(
      df.select(id.cast("long").as("vec_id"), emb.as("embedding")),
      semanticSeeds(df, id, emb, nClusters), iters)
    val bc = spark.sparkContext.broadcast(centroids)
    df.select(id.cast("long").as("vec_id"), emb.as("e"))
      .as[(Long, Array[Float])]
      .map { case (i, e) => (i, Similarity.nearestList(bc.value, e)) }
      .toDF("vec_id", "lst")
  }

  /** TWO-LEVEL (coarse-then-fine) cluster assignment — the structural
    * fix for [[semanticClusters]]' assignment cost under the k ∝ n
    * contract (SCALE.md emb_centroid_drift probe: flat assignment is
    * n*k = n²/64 dots — 34.7x for a 10x decade). The first `kc =
    * ceil(sqrt(k))` md5-ranked seeds double as COARSE centroids; every
    * fine seed attaches to its nearest coarse (metadata-sized,
    * driver-side), and a row then scores kc coarse + that cell's
    * children — ~2*sqrt(k) dots instead of k. Same score rule, same
    * lowest-index ties, everywhere.
    *
    * The trade is explicit: a row whose true nearest fine centroid
    * lives under a DIFFERENT coarse cell is re-routed (quantization
    * error — the IVF probe-miss analogue). Near-identical vectors
    * still co-cluster (identical inputs take identical paths), so the
    * dedup/drift regimes stay structurally safe. With `kcOverride =
    * k` the two levels collapse and the assignment EQUALS
    * [[semanticClusters]] exactly (DedupSpec pins this identity).
    *
    * 100 TB shape: identical to the flat path — centroids broadcast,
    * ONE zero-shuffle typed map — only the per-row flop count drops
    * from k to ~2*sqrt(k). */
  def semanticClustersTwoLevel(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, kcOverride: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fine = semanticSeeds(df, id, emb, nClusters)
    val cells = twoLevelCells(fine, kcOverride)
    val bcFine = spark.sparkContext.broadcast(fine)
    val bcCells = spark.sparkContext.broadcast(cells)
    df.select(id.cast("long").as("vec_id"), emb.as("e"))
      .as[(Long, Array[Float])]
      .map { case (i, e) =>
        (i, routeTwoLevel(bcFine.value, bcCells.value, e, 1)(0))
      }
      .toDF("vec_id", "lst")
  }

  /** The two-level routing table: coarse = first `kc` fine seeds
    * (default ceil(sqrt(k))), each fine seed attached to its nearest
    * coarse; returns the NON-EMPTY (coarse idx, sorted fine children)
    * cells — rows only consider these (a duplicate seed can orphan a
    * cell). Metadata-sized, computed driver-side. */
  private[graft] def twoLevelCells(fine: Array[Array[Double]],
      kcOverride: Int = 0): Array[(Int, Array[Int])] = {
    val kc0 =
      if (kcOverride > 0) kcOverride
      else math.max(1, math.ceil(math.sqrt(fine.length.toDouble)).toInt)
    val kc = math.min(kc0, fine.length)
    val coarse = fine.take(kc)
    val childOf = fine.map(f => Similarity.nearestListD(coarse, f))
    fine.indices.toArray
      .groupBy(childOf).toArray
      .map { case (c, fs) => (c, fs.sorted) }
      .sortBy(_._1)
  }

  /** Route a vector through the two-level table: nearest non-empty
    * coarse cell (score DESC, idx ASC ties), then that cell's children
    * ranked the same way — the top `nProbe` fine cells (all children
    * if fewer). `nProbe = 1` is the assignment;
    * larger values are the IVF probe set (an identical copy of a
    * probing vector takes the identical path, so its cell is always
    * probed — the structural-safety contract). */
  private[graft] def routeTwoLevel(fine: Array[Array[Double]],
      cells: Array[(Int, Array[Int])], e: Array[Float],
      nProbe: Int): Array[Int] = {
    def score(c: Array[Double]): Double = {
      var dot = 0.0
      var nc = 0.0
      var p = 0
      while (p < c.length) { dot += c(p) * e(p); nc += c(p) * c(p); p += 1 }
      if (nc == 0.0) Double.NegativeInfinity else dot / math.sqrt(nc)
    }
    var bi = 0
    var bs = Double.NegativeInfinity
    var ci = 0
    while (ci < cells.length) { // ascending coarse idx: strict > keeps lowest on ties
      val s = score(fine(cells(ci)._1))
      if (s > bs) { bs = s; bi = ci }
      ci += 1
    }
    val kids = cells(bi)._2
    if (nProbe == 1) {
      var bl = kids(0)
      var bls = Double.NegativeInfinity
      var ki = 0
      while (ki < kids.length) {
        val s = score(fine(kids(ki)))
        if (s > bls) { bls = s; bl = kids(ki) }
        ki += 1
      }
      Array(bl)
    } else {
      kids.map(f => (score(fine(f)), f))
        .sortBy { case (s, f) => (-s, f) }
        .take(nProbe).map(_._2)
    }
  }

  /** Integer cube-root ceiling: the smallest c >= 1 with c^3 >= k,
    * capped at k — PURE INTEGER (no cbrt float on either engine), the
    * same rule the SQL oracle re-derives as
    * `min(c) FROM range WHERE c*c*c >= k`. */
  private[graft] def autoKc3(k: Int): Int = {
    var c = 1L
    while (c * c * c < k) c += 1
    math.min(c, k.toLong).toInt
  }

  /** THREE-LEVEL (coarse → mid → fine) routing table — the next rung
    * above [[twoLevelCells]] on the assignment-cost ladder (SCALE.md):
    * under the k ∝ n contract the flat argmax is n·k dots, two-level
    * ~2√k per row (n^1.5 total), and this tree ~3·k^(1/3) per row
    * (n^(4/3) total) — at the fifth decade (k ≈ 312k) that is ~200
    * dots/row instead of ~1100. Derivation mirrors two-level
    * prefix-style: coarse = first kc = ceil∛k md5-ranked seeds, mid =
    * first km = min(k, kc²), each mid attaches to its nearest coarse
    * and each fine seed to its nearest mid (both metadata-sized,
    * driver-side). Only OCCUPIED paths survive (a mid with no fine
    * children, or a coarse whose mids are all childless, is never
    * offered to rows — the twoLevelCells orphan rule applied per
    * level). Same score (dot/‖c‖) and lowest-index tie rule
    * everywhere, so the whole table is SQL-replayable.
    *
    * Returns (coarse idx, its occupied (mid idx, sorted fine children)
    * cells, sorted) — only non-empty coarse entries. */
  private[graft] def threeLevelCells(fine: Array[Array[Double]],
      kcOverride: Int = 0, kmOverride: Int = 0)
      : Array[(Int, Array[(Int, Array[Int])])] = {
    val k = fine.length
    val kc = math.min(if (kcOverride > 0) kcOverride else autoKc3(k), k)
    val km = math.min(if (kmOverride > 0) kmOverride
      else math.min(kc.toLong * kc, k.toLong).toInt, k)
    val coarse = fine.take(kc)
    val mids = fine.take(km)
    val midOfFine = fine.map(f => Similarity.nearestListD(mids, f))
    val coarseOfMid = mids.map(m => Similarity.nearestListD(coarse, m))
    val finesByMid: Map[Int, Array[Int]] = fine.indices.toArray
      .groupBy(midOfFine).map { case (m, fs) => m -> fs.sorted }
    finesByMid.keys.toArray
      .groupBy(coarseOfMid).toArray
      .map { case (c, ms) =>
        (c, ms.sorted.map(m => (m, finesByMid(m))))
      }
      .sortBy(_._1)
  }

  /** Route a vector through the three-level table: nearest occupied
    * coarse, then that coarse's occupied mids, then that mid's fine
    * children — (score DESC, idx ASC) at every level, the
    * [[routeTwoLevel]] rule one level deeper. Returns the fine
    * cluster index (the assignment). */
  private[graft] def routeThreeLevel(fine: Array[Array[Double]],
      tree: Array[(Int, Array[(Int, Array[Int])])], e: Array[Float]): Int = {
    def score(c: Array[Double]): Double = {
      var dot = 0.0
      var nc = 0.0
      var p = 0
      while (p < c.length) { dot += c(p) * e(p); nc += c(p) * c(p); p += 1 }
      if (nc == 0.0) Double.NegativeInfinity else dot / math.sqrt(nc)
    }
    var bi = 0
    var bs = Double.NegativeInfinity
    var ci = 0
    while (ci < tree.length) { // ascending idx: strict > keeps lowest ties
      val s = score(fine(tree(ci)._1))
      if (s > bs) { bs = s; bi = ci }
      ci += 1
    }
    val mids = tree(bi)._2
    var mi = 0
    var ms = Double.NegativeInfinity
    var mb = 0
    while (mi < mids.length) {
      val s = score(fine(mids(mi)._1))
      if (s > ms) { ms = s; mb = mi }
      mi += 1
    }
    val kids = mids(mb)._2
    var bl = kids(0)
    var bls = Double.NegativeInfinity
    var ki = 0
    while (ki < kids.length) {
      val s = score(fine(kids(ki)))
      if (s > bls) { bls = s; bl = kids(ki) }
      ki += 1
    }
    bl
  }

  /** THREE-LEVEL cluster assignment — [[semanticClustersTwoLevel]]
    * with one more routing level: ~3·k^(1/3) dots per row instead of
    * ~2√k, the linear-assignment rung the cluster-statistics family
    * (centroids / balanced sample / drift) rides from round 9 (SCALE.md
    * measured the two-level route's n^1.5 curve approaching its bound
    * at the fourth decade). Same reroute trade as two-level, one level
    * deeper: a row whose true nearest fine centroid lives under a
    * different coarse or mid cell is re-routed; near-identical vectors
    * still co-cluster (identical inputs take identical paths). With
    * kcOverride = kmOverride = k all levels collapse and the
    * assignment EQUALS [[semanticClusters]] exactly (DedupSpec pins
    * the identity).
    *
    * 100 TB shape: unchanged from the flat path — centroids broadcast,
    * ONE zero-shuffle typed map; only the per-row flop count drops. */
  def semanticClustersThreeLevel(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, kcOverride: Int = 0, kmOverride: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fine = semanticSeeds(df, id, emb, nClusters)
    val tree = threeLevelCells(fine, kcOverride, kmOverride)
    val bcFine = spark.sparkContext.broadcast(fine)
    val bcTree = spark.sparkContext.broadcast(tree)
    df.select(id.cast("long").as("vec_id"), emb.as("e"))
      .as[(Long, Array[Float])]
      .map { case (i, e) =>
        (i, routeThreeLevel(bcFine.value, bcTree.value, e))
      }
      .toDF("vec_id", "lst")
  }

  /** EXACT distributed per-cluster centroid sums — the
    * oracle-comparable twin of the Lloyd mean update
    * (Similarity.refineLloyd's float means are reduce-order-sensitive;
    * these integer-micro sums are not): [[semanticClusters]]
    * assignment, then each vector explodes to (lst, pos, micros) with
    * micros = round(1e6 * component) and ONE (lst, pos)-keyed agg
    * emits (lst, pos, sum_micros, n_vecs). sum_micros/n_vecs is the
    * centroid component at 1e-6 resolution, and the sum is
    * order-independent (exact integers < 2^53 for 1e12 unit-norm
    * vectors), so two engines — or two cluster sizes — agree
    * bit-for-bit.
    *
    * 100 TB shape: zero-shuffle assignment map, one map-combinable agg
    * whose output is k x dim rows (metadata-sized); no driver work at
    * all until the caller collects the (tiny) centroid table. */
  def clusterCentroidsExact(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, levels: Int = 1): DataFrame = {
    // levels: routing depth — with the auto-sized k ∝ n the flat
    // argmax (levels=1) is n*k = n^2/64 dots (probed 29x for a 10x
    // decade on this query before the r8 rewire); two-level is
    // ~2*sqrt(k) dots/row (n^1.5), three-level ~3*k^(1/3) (n^(4/3),
    // the r9 rung). Same exact-integer sums at every depth; only
    // WHICH cluster a rerouted row lands in differs.
    val assign = levels match {
      case 3 => semanticClustersThreeLevel(df, id, emb, nClusters)
      case 2 => semanticClustersTwoLevel(df, id, emb, nClusters)
      case _ => semanticClusters(df, id, emb, nClusters)
    }
    val assigned = assign
      .join(df.select(id.cast("long").as("vec_id"), emb.as("e")), "vec_id")
    assigned
      .select(col("lst"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("lst"), col("pos"))
      .agg(sum(round(col("v").cast("double") * 1000000)).cast("long")
          .as("sum_micros"),
        count(lit(1)).as("n_vecs"))
  }

  /** Corpus-scaled SemDeDup cluster count: ceil(n / targetPerCluster)
    * clusters (>= 2), so expected cluster size stays ~targetPerCluster
    * and the within-cluster pair search stays ~targetPerCluster x
    * linear — the SemDeDup contract that clusters ARE the buckets and
    * k grows with the corpus (k pinned at any constant turns the
    * search quadratic: measured 25x for a 10x decade, SCALE.md). Pure
    * integer arithmetic, re-derivable in SQL from count(*). */
  def autoClusters(n: Long, targetPerCluster: Long = 64L): Int =
    math.max(2L, (n + targetPerCluster - 1L) / targetPerCluster).toInt

  /** SemDeDup keep-list: [[semanticDedupPairs]] -> [[survivors]] —
    * the output-linear form (one row per doc), the shape a 100 TB
    * pipeline materializes. */
  def semanticSurvivors(df: DataFrame, id: Column, emb: Column,
      nClusters: Int, threshold: Double, iters: Int = 0,
      maxCluster: Int = Int.MaxValue): DataFrame =
    survivors(df, id,
      semanticDedupPairs(df, id, emb, nClusters, threshold, iters, maxCluster)
        .select(col("a_id"), col("b_id")))
}
