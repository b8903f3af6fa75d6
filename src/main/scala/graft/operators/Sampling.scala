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
}
