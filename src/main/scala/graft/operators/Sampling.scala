package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling + sequence packing for training-data
  * pipelines (beyond-reference surface; the reference's only sampling
  * is time-bucket throttling).
  *
  * All three are reproducible by construction — no RNG state, no
  * partition-order dependence — so the same corpus always yields the
  * same sample/packing on any cluster size, and each is checkable
  * against an independent oracle:
  *   - hashSample / balancedSample key on md5 hex (identical across
  *     Spark and DuckDB) → SQL oracles;
  *   - packGreedy is a per-key fold (same secondary-sort shape as the
  *     throttle/book operators) → exact Python oracle.
  */
object Sampling {

  /** Keep ~`fraction` of rows, chosen by content hash: a row survives
    * iff the first 6 hex digits of md5(key) sort below
    * floor(fraction * 16^6). Deterministic, stable under reruns and
    * data repartitioning, and cheap at 100 TB (a codegen'd filter
    * right after the scan — no shuffle, no sort, no RNG seeds to
    * coordinate across executors). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction < 1, s"fraction $fraction not in (0,1)")
    df.filter(substring(md5(key), 1, 6) < hashBound(fraction))
  }

  /** The 6-hex-digit survival bound for `fraction` (shared with the
    * SQL oracle so both engines compare against the same literal). */
  def hashBound(fraction: Double): String =
    f"${math.floor(fraction * (1 << 24)).toLong}%06x"

  /** [[hashBound]] of a weight's FRACTIONAL part — "000000" (never
    * true) for whole weights. Shared by [[mixtureSample]] and its SQL
    * oracle so both engines compare the same literal. */
  def fracBound(w: Double): String =
    f"${math.floor((w - math.floor(w)) * (1 << 24)).toLong}%06x"

  /** [[fracBound]] from an integer MICRO-epoch fraction: floor(
    * frac/1e6 * 2^24) by pure integer arithmetic, so an oracle can
    * rebuild the literal in SQL —
    * `lower(lpad(to_hex(frac * 16777216 // 1000000), 6, '0'))` — and
    * both engines compare byte-identical strings with no double on
    * the path. */
  def fracBoundMicros(fracMicro: Long): String = {
    require(fracMicro >= 0 && fracMicro < 1000000L,
      s"frac micros $fracMicro not in [0, 1e6)")
    f"${fracMicro * (1L << 24) / 1000000L}%06x"
  }

  /** TEMPERATURE-sampling weights (alpha = 0.5) as integer
    * MICRO-epochs — the multilingual/domain rebalancing recipe of
    * mC4/ROOTS-style pipelines: sample domain g with probability
    * proportional to n_g^alpha, i.e. per-doc weight
    * w_g = N * n_g^alpha / (n_g * sum_h n_h^alpha), flattening the
    * domain distribution toward uniform while preserving total corpus
    * mass. Computed by a PURE integer rule — r_g = floor(sqrt(n_g))
    * (isqrt: exact in both engines' IEEE sqrt for n < 2^52), then
    * w_micro(g) = min(cap, 1e6 * N * r_g / (S * n_g)) with BigInt
    * floor division, S = sum r_h — so an oracle can re-derive every
    * weight from count(*) in SQL (HUGEINT `//`) and the two engines
    * agree bit-for-bit. `capMicros` bounds upsampling of tiny domains
    * (default 10 epochs — unbounded repetition of a rare domain is
    * never what you want). */
  def temperatureWeightsMicros(counts: Map[String, Long],
      capMicros: Long = 10000000L): Map[String, Long] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      s"temperature weights need positive group counts: $counts")
    require(capMicros >= 0 && capMicros <= 1000L * 1000000L,
      s"capMicros $capMicros out of [0, 1000 epochs]")
    val r = counts.map { case (g, n) =>
      g -> math.floor(math.sqrt(n.toDouble)).toLong
    }
    val nTot = counts.values.foldLeft(BigInt(0))(_ + _)
    val s = r.values.foldLeft(BigInt(0))(_ + _)
    counts.map { case (g, n) =>
      g -> (BigInt(1000000L) * nTot * r(g) / (s * n)).min(BigInt(capMicros)).toLong
    }
  }

  /** Per-group deterministic sample: the `n` rows of each group with
    * the smallest (md5(key), tieBreak) — class-balanced downsampling
    * (equal representation per language/source/label) without an RNG.
    * One shuffle on the group key; the window is a per-group top-n. */
  def balancedSample(df: DataFrame, group: Column, key: Column,
      tieBreak: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(md5(key).asc, tieBreak.asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Per-source frequency capping — the domain-capping step of a web
    * curation pipeline ("at most `cap` documents per domain, keep the
    * best"): within each `group` keep the top `cap` rows by
    * (`score` DESC, `tieBreak` ASC), emitting their 1-based rank `rn`.
    * Null scores rank below every real score (coalesced to -1, so
    * `score` must be a non-negative integer-exact column — the
    * qualityDecimicro discipline).
    *
    * 100 TB shape: a naive single window puts an entire domain in one
    * sort partition — a 1B-page domain becomes one task. This runs the
    * SALTED TWO-PHASE top-k instead: phase 1 ranks within
    * (group, tieBreak % salts) and keeps `cap` per salt — correct
    * because a row in the global top `cap` has at most cap-1 group
    * rows above it, hence at most cap-1 in its own salt bucket, so its
    * salt-local rank is <= cap and phase 1 never discards it. Phase 2
    * re-ranks the <= cap*salts survivors per group — a bounded
    * partition no matter how hot the domain — and rows outside the
    * global top cap cannot sneak in: everything above them survived
    * phase 1 too. Output is IDENTICAL to the single-window plan for
    * every salts >= 1 (spec-pinned), so `salts` is a pure parallelism
    * knob: size it so n_max_domain/salts fits one task's sort budget.
    */
  def sourceCap(df: DataFrame, group: Column, score: Column,
      tieBreak: Column, cap: Int, salts: Int = 16): DataFrame = {
    require(cap > 0 && salts > 0, s"sourceCap($cap, $salts): must be > 0")
    import org.apache.spark.sql.expressions.Window
    val s = coalesce(score, lit(-1L))
    val w1 = Window.partitionBy(group, pmod(tieBreak.cast("long"), lit(salts.toLong)))
      .orderBy(s.desc, tieBreak.asc)
    val survivors = df.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= cap).drop("__r1")
    val w2 = Window.partitionBy(group).orderBy(s.desc, tieBreak.asc)
    survivors.withColumn("rn", row_number().over(w2)).filter(col("rn") <= cap)
  }

  /** Deterministic MIXTURE resampling — the domain-weighting step of a
    * pre-training pipeline ("train on source A for 2.5 epochs, source
    * B for 0.4"): each row is emitted floor(w) times plus one more iff
    * its content hash survives the fractional part, where w is its
    * group's weight (`defaultWeight` for unlisted groups; 0 drops the
    * group). Epochs > 1 mean deterministic REPETITION — a 0-based
    * `copy` column distinguishes the replicas for downstream shuffling
    * — and the fractional epoch reuses the [[hashSample]] md5-prefix
    * rule, so it is the same content-chosen subset every run on any
    * cluster, and the union property holds: the rows a 1.5x weight
    * repeats are exactly the rows a 0.5x weight would keep.
    *
    * 100 TB shape: ZERO shuffle — weights compile into a literal
    * when-chain, repetition is a per-row `explode(sequence)`, and the
    * fractional-copy test is the codegen'd md5-prefix filter, all
    * right after the scan. Output size = sum of group weights times
    * group sizes, by construction. */
  def mixtureSample(df: DataFrame, group: Column, key: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w =>
      w >= 0 && w <= 1000), s"weights out of [0,1000]: $weights")
    def full(w: Double): Long = math.floor(w).toLong
    val fullCol = weights.foldLeft(lit(full(defaultWeight))) {
      case (acc, (g, w)) => when(group === lit(g), lit(full(w))).otherwise(acc)
    }
    val boundCol = weights.foldLeft(lit(fracBound(defaultWeight))) {
      case (acc, (g, w)) => when(group === lit(g), lit(fracBound(w))).otherwise(acc)
    }
    val copies = fullCol +
      when(substring(md5(key), 1, 6) < boundCol, 1L).otherwise(0L)
    // sequence(0, n-1) only when n > 0: explode drops the null rows,
    // and the guard matters — Spark's sequence(0, -1) is a DESCENDING
    // [0, -1], not empty
    df.withColumn("copy",
      explode(when(copies > lit(0L), sequence(lit(0L), copies - lit(1L)))))
  }

  /** [[mixtureSample]] with weights in integer MICRO-epochs — the
    * exact-arithmetic twin ([[fracBoundMicros]] literals instead of
    * double-derived ones) used when the weights themselves are DERIVED
    * by an integer rule both engines replay (temperature sampling).
    * Same zero-shuffle when-chain + explode(sequence) shape, same
    * union property. Groups absent from the map get `defaultMicros`. */
  def mixtureSampleMicros(df: DataFrame, group: Column, key: Column,
      weightsMicros: Map[String, Long],
      defaultMicros: Long = 1000000L): DataFrame = {
    require((weightsMicros.values ++ Seq(defaultMicros)).forall(w =>
      w >= 0 && w <= 1000L * 1000000L),
      s"micro weights out of [0, 1000 epochs]: $weightsMicros")
    val fullCol = weightsMicros.foldLeft(lit(defaultMicros / 1000000L)) {
      case (acc, (g, wm)) =>
        when(group === lit(g), lit(wm / 1000000L)).otherwise(acc)
    }
    val boundCol = weightsMicros.foldLeft(
        lit(fracBoundMicros(defaultMicros % 1000000L))) {
      case (acc, (g, wm)) =>
        when(group === lit(g), lit(fracBoundMicros(wm % 1000000L))).otherwise(acc)
    }
    val copies = fullCol +
      when(substring(md5(key), 1, 6) < boundCol, 1L).otherwise(0L)
    df.withColumn("copy",
      explode(when(copies > lit(0L), sequence(lit(0L), copies - lit(1L)))))
  }

  /** TEMPERATURE-scaled domain mixture, end to end: group counts ->
    * [[temperatureWeightsMicros]] (alpha = 0.5 integer rule) ->
    * [[mixtureSampleMicros]]. Groups seen in the count are weighted;
    * the map covers every group by construction, so defaultMicros is
    * irrelevant (0 for safety).
    *
    * 100 TB shape: ONE map-combinable count agg whose result is
    * GROUP-cardinality-sized metadata (domains/languages — tens, the
    * one driver collect), then the zero-shuffle literal when-chain
    * right after the scan. The weights depend only on group counts,
    * so they are identical on any cluster, and the fractional-epoch
    * subset is content-chosen ([[hashSample]] rule) — the same docs
    * repeat on every run. */
  def temperatureMixture(df: DataFrame, group: Column, key: Column,
      capMicros: Long = 10000000L): DataFrame = {
    // null groups drop (defaultMicros = 0): a null domain can't carry a
    // weight literal — the when-chain comparison is never true for it
    val counts = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
      .collect().filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mixtureSampleMicros(df, group, key,
      temperatureWeightsMicros(counts, capMicros), defaultMicros = 0L)
  }

  /** Deterministic GLOBAL SHUFFLE into `n` training shards — the
    * write-side randomization step of a pre-training pipeline (break
    * source/time locality before sequential shard reads). Each row
    * gets a `shard` (0-based) from its md5 prefix — the [[hashBound]]
    * boundaries cut the 24-bit hash space into n equal slices, as a
    * literal when-chain, so assignment is a codegen'd zero-shuffle map
    * — and a `shard_pos` read order within its shard by (md5(key),
    * tieBreak): content-pseudo-random, reproducible on any cluster
    * size, no RNG coordination.
    *
    * 100 TB shape: ONE shuffle on `shard` (exactly the exchange the
    * physical shard write needs anyway — repartition by shard + sort
    * within = this plan) with ~corpus/n rows per shard; size n so a
    * shard's sort fits an executor's spill budget (real pipelines use
    * thousands of shards, keeping the when-chain is then wrong — at
    * n > ~64 switch the assignment to a numeric slice of the hash;
    * kept literal here because the literal IS the cross-engine oracle
    * contract, like hashBound). */
  def shuffleShards(df: DataFrame, key: Column, tieBreak: Column,
      n: Int): DataFrame = {
    require(n > 1 && n <= 64, s"shard count $n not in [2,64]")
    import org.apache.spark.sql.expressions.Window
    val pref = substring(md5(key), 1, 6)
    val shard = (1 until n)
      .map(i => hashBound(i.toDouble / n))
      .foldLeft(lit(0)) { (acc, b) =>
        acc + when(pref >= lit(b), 1).otherwise(0)
      }
    val w = Window.partitionBy(col("shard")).orderBy(md5(key).asc, tieBreak.asc)
    df.withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w))
  }

  /** Greedy sequence packing: per `by` key, rows sorted by `okeyCol`
    * fill bins of `capacity` tokens; a row that would overflow the
    * current bin starts the next one (rows above `capacity` get a bin
    * of their own). The training-batch packing step of an LLM data
    * pipeline, as a distributed per-key fold: one shuffle on the key,
    * in-partition sort, tight scan — same execution shape as
    * throttleElapsed. Emits the input row + `bin` (0-based per key)
    * and `bin_fill` (tokens in the bin after placing the row).
    * `tokenCol` must be a non-null Long column (fails fast otherwise).
    * With empty `by` the packing is one global sequential fold — one
    * partition by necessity (there is no parallel greedy packing). */
  def packGreedy(df: DataFrame, tokenCol: String, capacity: Long,
      by: Seq[String], okeyCol: String): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val cols = df.columns
    val tokIdx = cols.indexOf(tokenCol)
    require(tokIdx >= 0, s"missing token column $tokenCol")
    val byIdx = by.map(c => cols.indexOf(c))
    val sorted = (if (by.isEmpty) df.repartition(1)
      else df.repartition(by.map(col): _*))
      .sortWithinPartitions((by.map(col) :+ col(okeyCol).asc): _*)
    val schema = sorted.schema
      .add("bin", org.apache.spark.sql.types.LongType, nullable = false)
      .add("bin_fill", org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.mapPartitions { iter =>
      var curKey: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      iter.map { row =>
        val key = byIdx.map(row.get)
        if (curKey == null || key != curKey) { curKey = key; bin = 0L; fill = 0L }
        val t = row.getLong(tokIdx)
        if (fill > 0 && fill + t > capacity) { bin += 1; fill = 0L }
        fill += t
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ bin :+ fill)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** PADDING-WASTE report — the sequence-length sizing study a
    * training pipeline runs BEFORE committing to a context length:
    * for each candidate length L, what fraction of corpus tokens is
    * lost to truncation (docs longer than L) and what fraction of the
    * batch tensor is padding (docs shorter than L, padded to L in the
    * pad-to-max batch=1 model — the worst case [[packGreedy]] exists
    * to beat, which is exactly why the report shows it). One row per
    * L: doc/truncation counts, exact token sums, and utilization in
    * ppm (`useful * 1e6 div (n_docs * L)`).
    *
    * Determinism: all exact integer sums over [[
    * graft.operators.TextAnalysis.tokenCount]] (the shared regex
    * tokenizer), ppm by Long floor division. 100 TB shape: ONE
    * tokenizing scan, a |lengths|-way explode of 16-byte (L, tok)
    * pairs, one map-combinable agg keyed by the handful of Ls. */
  def paddingReport(df: DataFrame, text: Column,
      lengths: Seq[Long]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ > 0), "lengths must be positive")
    val toks = df.select(
      graft.operators.TextAnalysis.tokenCount(text).cast("long").as("tok"))
    toks
      .select(col("tok"), explode(typedLit(lengths)).as("seq_len"))
      .groupBy("seq_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("tok") > col("seq_len"), 1L).otherwise(0L)).as("n_truncated"),
        sum(col("tok")).as("tokens_total"),
        sum(greatest(col("tok") - col("seq_len"), lit(0L))).as("tokens_lost"),
        sum(col("seq_len") - least(col("tok"), col("seq_len"))).as("pad_tokens"))
      .select(col("seq_len"), col("n_docs"), col("n_truncated"),
        col("tokens_total"), col("tokens_lost"), col("pad_tokens"),
        // the *1e6 numerator rides DECIMAL(38,0): on Long it overflows
        // (ANSI throw) once corpus tokens exceed ~9.2e12 — i.e. exactly
        // at the 100 TB scale this report targets. `div` on decimals
        // still floors to BIGINT, so the value and schema are unchanged
        // at every scale both engines can represent.
        expr("cast(tokens_total - tokens_lost as decimal(38,0)) * 1000000" +
          " div (n_docs * seq_len)").as("util_ppm"))
  }

  /** Deterministic train/val/test split by content hash: a document's
    * split is a pure function of md5(key) — reproducible on any
    * cluster, stable under reruns and repartitioning, and stratified
    * BY CONSTRUCTION (the hash is independent of any grouping column,
    * so every stratum lands ~the same proportions without a shuffle —
    * the hashSample argument applied to assignment instead of
    * filtering). Zero exchanges: a codegen'd CASE over md5 right
    * after the scan. Boundaries come from [[hashBound]] — identical
    * hex literals in the SQL oracle. */
  def hashSplit(df: DataFrame, key: Column, trainFrac: Double,
      valFrac: Double): DataFrame = {
    require(trainFrac > 0 && valFrac > 0 && trainFrac + valFrac < 1,
      s"bad split ($trainFrac, $valFrac)")
    val h = substring(md5(key), 1, 6)
    df.withColumn("split",
      when(h < hashBound(trainFrac), "train")
        .when(h < hashBound(trainFrac + valFrac), "val")
        .otherwise("test"))
  }

  /** Token-budget corpus selection: keep the best documents — ordered
    * by (quality key DESC, doc_id), a total order; callers pass an
    * EXACT quality key, canonically the integer decimicro key from
    * [[graft.operators.TextAnalysis.qualityDecimicro]] (never a double
    * `round`: the rounding-boundary rule) — whose running token total
    * fits `budget`. The data-selection step between scoring and
    * training ("train on the best N tokens").
    *
    * The naive formulation is a GLOBAL running sum over the quality
    * sort: one window partition swallowing the corpus. Here the cut
    * is derived from a bucketed HISTOGRAM instead (the classic
    * distributed weighted-top-k): per distinct rounded quality, total
    * tokens — a bounded-cardinality aggregate (4dp quality has at
    * most ~10^4 values per unit range), collected as metadata (the
    * IVF-centroid boundary). Buckets strictly above the cut select
    * wholesale; only the boundary bucket needs an in-bucket running
    * sum, and every window partition is ONE quality value, never the
    * corpus. Output cum_tokens reconstructs the global running sum
    * from the broadcast bucket offsets — row-identical to the naive
    * global-window formulation (the SQL oracle runs exactly that).
    *
    * `rows` must carry (doc_id long, q — any orderable numeric key,
    * canonically a long decimicro, n_tokens long >= 1); degenerate
    * docs (null q) are excluded by the caller. */
  def tokenBudgetSelect(rowsIn: DataFrame, budget: Long): DataFrame = {
    val spark = rowsIn.sparkSession
    import org.apache.spark.sql.expressions.Window
    // PERSIST the scored frame: it has three readers (the histogram
    // action, the full-bucket join, the boundary filter), and the
    // caller's quality expression is typically regex-heavy — without
    // the persist it re-evaluates per reader (the tfidf lesson;
    // measured 9.6x at the sf1eq probe, 3 corpus passes)
    val rows = rowsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket histogram: bounded metadata, ordered best-first. The
    // desc sort rides the frame's own q ordering (long or double),
    // so the collected rows arrive already best-first.
    val hist = rows.groupBy("q").agg(sum("n_tokens").as("btoks"))
      .orderBy(col("q").desc)
      .collect().map(r => (r.get(0), r.getLong(1)))
    var off = 0L
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Any, Long)]
    var cut = Option.empty[(Any, Long)] // (q*, remaining budget)
    var i = 0
    while (i < hist.length && cut.isEmpty) {
      val (q, btoks) = hist(i)
      if (off + btoks <= budget) { offsets += ((q, off)); off += btoks }
      else cut = Some((q, budget - off))
      i += 1
    }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q", rowsIn.schema("q").dataType),
      org.apache.spark.sql.types.StructField("off",
        org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame( // explicit schema: safe when empty
      java.util.Arrays.asList(offsets.toSeq.map { case (q, o) =>
        org.apache.spark.sql.Row(q, o) }: _*), offSchema)
    val inBucket = Window.partitionBy(col("q")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = rows.join(broadcast(offDf), "q")
      .withColumn("cum_tokens", col("off") + sum("n_tokens").over(inBucket))
      .select("doc_id", "q", "n_tokens", "cum_tokens")
    cut match {
      case None => full
      case Some((qStar, r)) =>
        val boundaryOff = budget - r
        val boundary = rows.filter(col("q") === qStar)
          .withColumn("run", sum("n_tokens").over(inBucket))
          .filter(col("run") <= r)
          .select(col("doc_id"), col("q"), col("n_tokens"),
            (col("run") + lit(boundaryOff)).as("cum_tokens"))
        full.unionByName(boundary)
    }
  }
}
