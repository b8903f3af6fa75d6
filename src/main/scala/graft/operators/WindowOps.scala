package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** The reference's window-style feature operators, vectorized.
  *
  * In svoe these are all row-at-a-time stateful folds over a streamz
  * graph (`streamz.accumulate`, SURVEY.md §2.4) — the reference's own
  * perf notes mark that model as its bottleneck. Here each becomes a
  * native window/group aggregation: whole-stage-codegen'd, partial-agg
  * (map-side combine) where grouped, shuffled once on the key.
  *
  * Determinism convention: event time is an epoch-micros Long. Ordering
  * uses `orderKey(tsUs, id) = tsUs*1000 + id%1000` — a total order even
  * when two events share a microsecond, and exactly reproducible in the
  * DuckDB oracle (pure integer arithmetic). Range frames are expressed
  * in the same units (1 us = 1000 key units), so frame membership is
  * identical across engines.
  */
object WindowOps {

  /** Total-order key: epoch micros * 1000 + id mod 1000. */
  def orderKey(tsUs: Column, id: Column): Column =
    tsUs * lit(1000L) + pmod(id, lit(1000L))

  /** Sliding lookback window `(okey - lookbackUs, okey]` in order-key
    * units, per `by` keys (svoe `stream_utils.py:31-39` lookback deque).
    */
  def sliding(by: Seq[Column], okey: Column, lookbackUs: Long): WindowSpec =
    Window
      .partitionBy(by: _*)
      .orderBy(okey.asc)
      .rangeBetween(-lookbackUs * 1000L, 0L)

  /** Epoch-aligned tumbling bucket start in micros (svoe
    * `common/time/utils.py:40-51`). Integer floor-div: ts must be >= 0.
    */
  def bucket(tsUs: Column, widthUs: Long): Column =
    (tsUs.cast("long") / lit(widthUs)).cast("long") * lit(widthUs)

  /** OHLCV per tumbling window (svoe `ohlcv_fd.py:28-101`): open/high/
    * low/close, volume = sum(amount), vwap = sum(p*a)/sum(a), count.
    * Open/close are min_by/max_by on the total order key — deterministic
    * and fully map-side-combinable (no window sort at all).
    */
  def ohlcv(
      df: DataFrame,
      tsUs: Column,
      okey: Column,
      price: Column,
      amount: Column,
      widthUs: Long,
      keys: Seq[Column]): DataFrame =
    df.groupBy((keys :+ bucket(tsUs, widthUs).as("bucket_us")): _*)
      .agg(
        min_by(price, okey).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, okey).as("close"),
        sum(amount).as("volume"),
        when(sum(amount) =!= lit(0.0), sum(price * amount) / sum(amount)).as("vwap"),
        count(lit(1)).as("num_trades"))

  /** Sliding-window population stddev (svoe `volatility_stddev_fd.py`,
    * A2). The reference recomputes np.std per event over a deque; the
    * window frame computes the identical quantity incrementally.
    */
  def volatility(value: Column, by: Seq[Column], okey: Column,
      lookbackUs: Long): Column =
    stddev_pop(value).over(sliding(by, okey, lookbackUs))

  /** Trade volume imbalance 2(buy-sell)/(buy+sell) of notional over a
    * sliding lookback (svoe `trade_volume_imb_fd.py:30-117`, A3).
    */
  def tvi(notional: Column, isBuy: Column, by: Seq[Column], okey: Column,
      lookbackUs: Long): Column = {
    val w = sliding(by, okey, lookbackUs)
    val buy = sum(when(isBuy, notional).otherwise(lit(0.0))).over(w)
    val sell = sum(when(!isBuy, notional).otherwise(lit(0.0))).over(w)
    when(buy + sell =!= lit(0.0), lit(2.0) * (buy - sell) / (buy + sell))
  }

  /** TVI over buy/sell notional columns already split (the common
    * trades-table shape: `side ∈ {BUY, SELL}`). */
  def tviSided(buyNotional: Column, sellNotional: Column): Column =
    when(buyNotional + sellNotional =!= lit(0.0),
      lit(2.0) * (buyNotional - sellNotional) / (buyNotional + sellNotional))

  /** Relative diff (last-first)/first over a sliding lookback (svoe
    * `transforms/diff/diff.py:14-64`, A5). With a total order key,
    * last_value over the range frame is the current row's value.
    */
  def relDiff(value: Column, by: Seq[Column], okey: Column,
      lookbackUs: Long): Column = {
    val w = sliding(by, okey, lookbackUs)
    val first = first_value(value).over(w)
    when(first =!= lit(0.0), (value - first) / first)
  }

  /** Bucket sampling: one row per (keys, bucket): the latest value (A6,
    * svoe `trade_volume_imb_fd.py:103-117` bucket variant — chosen as
    * the canonical semantics; the elapsed-time variant is path-dependent
    * and lives in the stateful ops, see SURVEY.md §7).
    */
  def sampleBucket(
      df: DataFrame,
      tsUs: Column,
      okey: Column,
      value: Column,
      widthUs: Long,
      keys: Seq[Column]): DataFrame =
    df.groupBy((keys :+ bucket(tsUs, widthUs).as("bucket_us")): _*)
      .agg(
        max_by(value, okey).as("last_value"),
        count(lit(1)).as("n_events"))

  /** Sketch-based quantiles — the 100 TB twin of the exact
    * `percentile()` path (`ev_value_quantiles`): exact interpolated
    * percentiles need every group's values collected and sorted on one
    * task, which at scale is a full sort per group; `percentile_approx`
    * merges bounded GK sketches map-side, so the shuffle carries one
    * O(accuracy)-sized sketch per (partition, key) instead of every
    * row. Guarantee: each returned value's RANK is within n/accuracy of
    * the requested quantile's (WindowOpsSpec pins this against the
    * exact query). Exact stays the driver oracle — sketch contents are
    * implementation-specific, so cross-engine hash compare is
    * impossible by construction.
    */
  def approxQuantiles(df: DataFrame, value: Column, keys: Seq[Column],
      probs: Seq[Double], accuracy: Int): DataFrame = {
    val aggs = probs.map(p =>
      percentile_approx(value, lit(p), lit(accuracy))
        .as("ap" + (p * 100).round))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Bound-VALIDATION frame for [[approxQuantiles]] — the cross-engine
    * correctness surface for the sketch. Sketch values themselves are
    * engine-specific (no exact engine can hash-match them), but the GK
    * GUARANTEE is checkable: the returned value's 0-based rank among
    * the group's sorted values lies in [ceil(q*n - tol), floor(q*n +
    * tol)] with tol = n/accuracy + 1 (the +1 absorbs discrete rank
    * granularity — the same convention WindowOpsSpec pins). Since
    * `percentile_approx` returns an actual column value, the guarantee
    * implies lo_val <= approx <= hi_val where lo_val/hi_val are the
    * sorted values at the clamped window edges. Emitted per (keys, q):
    * (q, n, lo_val, hi_val, within_bound) — an exact engine reproduces
    * everything but the comparison from ranks alone and `within_bound =
    * true` by construction, so the frame hash-compares cross-engine
    * while a bound-violating sketch breaks the hash.
    *
    * The exact side sorts each group's values into one array, so this
    * frame is the verification HARNESS (run at validation SF next to
    * the sketch); the production 100 TB path is [[approxQuantiles]]
    * alone. Rank arithmetic is IEEE double then exact integers —
    * identical in any engine evaluating the same formula. */
  def approxQuantileBounds(df: DataFrame, value: Column, keys: Seq[String],
      probs: Seq[Double], accuracy: Int): DataFrame = {
    val aggCols =
      sort_array(collect_list(value)).as("__vals") +:
        count(lit(1)).as("n") +:
        probs.map(p => percentile_approx(value, lit(p), lit(accuracy))
          .as("__ap" + (p * 100).round))
    val g = df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val checks = probs.map { p =>
      val target = lit(p) * col("n")
      val tol = col("n") / lit(accuracy.toDouble) + lit(1.0)
      val rLo = greatest(lit(1L), ceil(target - tol) + lit(1L))
      val rHi = least(col("n"), floor(target + tol) + lit(1L))
      val loVal = element_at(col("__vals"), rLo.cast("int"))
      val hiVal = element_at(col("__vals"), rHi.cast("int"))
      val ap = col("__ap" + (p * 100).round)
      struct(lit(p).as("q"), loVal.as("lo_val"), hiVal.as("hi_val"),
        (ap >= loVal && ap <= hiVal).as("within_bound"))
    }
    g.select(keys.map(col) :+ col("n") :+ explode(array(checks: _*)).as("__c"): _*)
      .select(keys.map(col) ++ Seq(col("__c.q").as("q"), col("n"),
        col("__c.lo_val").as("lo_val"), col("__c.hi_val").as("hi_val"),
        col("__c.within_bound").as("within_bound")): _*)
  }

  /** Uniform downsample: every nth row in okey order per key (P8, svoe
    * `df_utils.py:168-169`).
    */
  def downsample(df: DataFrame, by: Seq[Column], okey: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(by: _*).orderBy(okey.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(pmod(col("__rn") - 1, lit(n)) === 0)
      .drop("__rn")
  }

  /** Snapshot-delimited session id (SURVEY.md §2.5): running count of
    * delimiter rows in okey order per key — each group spans from one
    * delimiter (inclusive) to the next.
    */
  def delimitedGroupId(isDelimiter: Column, by: Seq[Column], okey: Column): Column = {
    val w = Window.partitionBy(by: _*).orderBy(okey.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(when(isDelimiter, 1L).otherwise(0L)).over(w)
  }

  /** Forward-fill RESAMPLING over a complete bucket spine — the
    * gap-filling half of resampling (a bucket with no events still
    * emits a row carrying the last known values): per key the spine is
    * `sequence(min_bucket, max_bucket, bucketUs)` exploded (bounded by
    * the key's time span over the bucket width — metadata-sized per
    * key, never data-sized), the aggregate frame left-joins it, and
    * `fillCols` forward-fill via `last(_, ignoreNulls)` over the
    * per-key bucket order while `zeroCols` coalesce to 0 (counts/sums
    * of an empty bucket). Appends `is_gap`. The window partitions per
    * key over BUCKET rows — span/width rows per key however dense the
    * underlying data, so the per-key-timeline concern of row-level
    * folds does not apply. */
  def resampleFfill(agg: org.apache.spark.sql.DataFrame, key: String,
      bucketCol: String, bucketUs: Long, fillCols: Seq[String],
      zeroCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(bucketUs > 0 && fillCols.nonEmpty, "bad resample knobs")
    val bounds = agg.groupBy(key)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val spine = bounds.select(col(key),
      explode(sequence(col("__lo"), col("__hi"), lit(bucketUs))).as(bucketCol))
    val joined = spine.join(agg, Seq(key, bucketCol), "left")
      .withColumn("is_gap", col(fillCols.head).isNull)
    val w = Window.partitionBy(col(key)).orderBy(col(bucketCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fillCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)) }
    zeroCols.foldLeft(filled) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))) }
  }

  /** EXACT z-score anomaly flag over a sliding lookback — the alert a
    * monitoring pipeline raises per event, decided in PURE INTEGER
    * arithmetic so the boundary can never flip between engines:
    * |x - mean| > z·sigma  ⟺  (n·x - s)² > z²·(n·ss - s²)
    * over integer cents (s = window sum, ss = window sum of squares).
    * No division, no sqrt, no rounded float in the comparison — the
    * rounded-stddev variant would make borderline rows
    * engine-dependent (the `.5`-boundary class of bug).
    *
    * Overflow bound: |n·x - s| < 2·n·maxCents must stay under ~3e9
    * (square < 2^63) — n ≤ 3e4 rows/window at 1e5-cent values. Wider
    * windows at 100 TB: pre-aggregate to coarser buckets first or use
    * the float `volatility` path for the sigma and keep this exact
    * test for the final gate on the (tiny) flagged subset.
    *
    * Returns the flag column; callers attach n for auditability. */
  def anomalyExactFlag(cents: Column, by: Seq[Column], okey: Column,
      lookbackUs: Long, z: Int): Column = {
    val w = sliding(by, okey, lookbackUs)
    val n = count(lit(1)).over(w)
    val s = sum(cents).over(w)
    val ss = sum(cents * cents).over(w)
    val dev = n * cents - s
    (dev * dev) > lit(z.toLong * z) * (n * ss - s * s)
  }
}
