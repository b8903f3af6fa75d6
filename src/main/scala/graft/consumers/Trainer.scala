package graft.consumers

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Minimal trainer + model-backed inference hookup for the
  * FeatureLabelSet (svoe `trainer/trainer_manager.py:52-208` fits
  * XGBoost over the featurizer output; `backtester/inference/
  * inference_loop.py:35-90` serves the model inside the backtest loop).
  *
  * JVM-side equivalent without new dependencies:
  *   - `fitLinear`: distributed closed-form ridge regression — one
  *     `treeAggregate` pass accumulates the (k+1)x(k+1) normal
  *     equations (X'X, X'y), solved driver-side by Gaussian
  *     elimination. Scales to any row count (the shuffle is a
  *     fixed-size matrix per partition) and any executor count.
  *   - `Model`: the prediction surface the backtester consumes;
  *     `modelStrategy` adapts it to a `Backtester.Strategy`, which IS
  *     the reference's inference-in-the-loop (model called per event
  *     row, synchronously — the async batching in the reference is a
  *     serving optimization, not a semantic).
  *   - `exportLibsvm` / `exportMatrix`: the feature-matrix handoff for
  *     external learners (LibSVM text is XGBoost's native input; the
  *     parquet matrix keeps full fidelity).
  */
object Trainer {

  /** A fitted model: feature vector (in `featureCols` order) → score. */
  trait Model extends Serializable {
    def predict(features: Array[Double]): Double
  }

  final case class LinearModel(intercept: Double, weights: Array[Double])
      extends Model {
    def predict(features: Array[Double]): Double = {
      var acc = intercept
      var i = 0
      while (i < weights.length) { acc += weights(i) * features(i); i += 1 }
      acc
    }
  }

  /** Closed-form ridge fit of `labelCol ~ featureCols` with intercept:
    * one distributed pass accumulating the augmented normal equations,
    * then a (k+1)-dim solve on the driver. `lambda` regularizes the
    * diagonal (not the intercept). Rows with any null/NaN feature or
    * label are skipped. */
  /** The distributed half of the fit: one treeAggregate pass over
    * (features, label) accumulating the augmented normal equations
    * `[X'X | X'y]` as a (d*d + d)-double array, d = #features + 1
    * (intercept column of ones). Null/NaN rows are skipped. */
  private def accumulateNormalEquations(df: DataFrame,
      featureCols: Seq[String], labelCol: String): Array[Double] = {
    val k = featureCols.size
    val d = k + 1
    val cols = (featureCols :+ labelCol).map(c => col(c).cast("double"))
    val rows = df.select(cols: _*).rdd
    val zero = new Array[Double](d * d + d)
    def seq(acc: Array[Double], r: Row): Array[Double] = {
      var bad = false
      var i = 0
      while (i < d && !bad) { bad = r.isNullAt(i) || r.getDouble(i).isNaN; i += 1 }
      if (!bad) {
        val x = new Array[Double](d)
        x(0) = 1.0
        var j = 0
        while (j < k) { x(j + 1) = r.getDouble(j); j += 1 }
        val y = r.getDouble(k)
        var a = 0
        while (a < d) {
          var b = 0
          while (b < d) { acc(a * d + b) += x(a) * x(b); b += 1 }
          acc(d * d + a) += x(a) * y
          a += 1
        }
      }
      acc
    }
    def comb(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    rows.treeAggregate(zero)(seq, comb)
  }

  /** The normal-equations pass exposed as a frame for verification:
    * (i, j, value) rows over the augmented design matrix — i indexes
    * [intercept, features...], j == d is the X'y column. With
    * INTEGER-VALUED features and label every partial sum is exact
    * (below 2^53 addition of integers is associative), so the frame is
    * order-independent and cross-engine hash-comparable — the
    * scale-critical distributed aggregation of [[fitLinear]] sits
    * under an exact oracle while the O(d^3) driver solve stays local. */
  def normalEquations(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    val d = featureCols.size + 1
    val acc = accumulateNormalEquations(df, featureCols, labelCol)
    val spark = df.sparkSession
    import spark.implicits._
    (for { i <- 0 until d; j <- 0 to d } yield
      (i, j, if (j < d) acc(i * d + j) else acc(d * d + i)))
      .toDF("i", "j", "value")
  }

  /** EXACT-INTEGER least squares for TWO features + intercept, solved
    * by Cramer's rule over the collected normal equations — the fit
    * half of the model-based quality filter
    * ([[graft.operators.TextAnalysis.modelQualityScores]]). With
    * integer-valued features and label, the distributed accumulation
    * is order-independent ([[normalEquations]] scaladoc) and the
    * driver solve is BigInt arithmetic, so the learned weights are
    * bit-identical across engines and partitionings — no float solve
    * anywhere. Weights come back as MICROS: `w_i = trunc(1e6 *
    * adj(A)b_i / det(A))`, truncation toward zero sign-factored so
    * DuckDB's positive-operand `//` replays it exactly.
    *
    * `acc` layout: [n, s1, s2, s11, s12, s22, sy, s1y, s2y] (A
    * symmetric, b the last three). Magnitude bound: |adj·b|·1e6 must
    * stay under ~1.7e38 (int128) — with features below ~1e4 that
    * holds for seed sets up to ~1e7 rows; bound the seed with a hash
    * sample (the DCLM shape: seeds are small, scoring is corpus-wide),
    * not by feeding the full corpus to the fit. */
  def cramerMicroWeights3(acc: Array[BigInt]): Array[Long] = {
    require(acc.length == 9, s"need 9 sums, got ${acc.length}")
    val Array(n, s1, s2, s11, s12, s22, sy, s1y, s2y) = acc
    val c00 = s11 * s22 - s12 * s12
    val c01 = -(s1 * s22 - s12 * s2)
    val c02 = s1 * s12 - s11 * s2
    val c11 = n * s22 - s2 * s2
    val c12 = -(n * s12 - s1 * s2)
    val c22 = n * s11 - s1 * s1
    val det = n * c00 + s1 * c01 + s2 * c02
    require(det != 0, "singular normal equations: features collinear on the seed")
    val nums = Array(
      c00 * sy + c01 * s1y + c02 * s2y,
      c01 * sy + c11 * s1y + c12 * s2y,
      c02 * sy + c12 * s1y + c22 * s2y)
    nums.map { wn =>
      val sign = if ((wn < 0) != (det < 0)) -1L else 1L
      sign * ((wn.abs * 1000000) / det.abs).toLong
    }
  }

  /** [[cramerMicroWeights3]] over a distributed frame: one exact
    * treeAggregate pass (integer-valued doubles, asserted), BigInt
    * solve on the driver. */
  def fitExactMicros(df: DataFrame, featureCols: Seq[String],
      labelCol: String): Array[Long] = {
    require(featureCols.size == 2, "exact Cramer fit supports exactly 2 features")
    val a = accumulateNormalEquations(df, featureCols, labelCol)
    // acc layout from accumulate: A row-major (d*d) then b (d), d=3
    val picked = Array(a(0), a(1), a(2), a(4), a(5), a(8), a(9), a(10), a(11))
    require(picked.forall(v => v.isWhole && math.abs(v) < 9.007199254740992e15),
      "exact fit needs integer-valued features/label within 2^53")
    cramerMicroWeights3(picked.map(v => BigInt(v.toLong)))
  }

  def fitLinear(df: DataFrame, featureCols: Seq[String], labelCol: String,
      lambda: Double = 1e-8): LinearModel = {
    val k = featureCols.size
    val d = k + 1 // augmented with the intercept column of ones
    val acc = accumulateNormalEquations(df, featureCols, labelCol)

    // solve (X'X + lambda*I_noIntercept) w = X'y, partial pivoting
    val m = Array.tabulate(d, d + 1) { (i, j) =>
      if (j < d) acc(i * d + j) + (if (i == j && i > 0) lambda else 0.0)
      else acc(d * d + i)
    }
    var colIdx = 0
    while (colIdx < d) {
      var p = colIdx
      var r2 = colIdx + 1
      while (r2 < d) { if (math.abs(m(r2)(colIdx)) > math.abs(m(p)(colIdx))) p = r2; r2 += 1 }
      val t = m(colIdx); m(colIdx) = m(p); m(p) = t
      require(math.abs(m(colIdx)(colIdx)) > 1e-12,
        s"singular normal equations at pivot $colIdx — " +
          "feature collinear or constant; raise lambda")
      var r3 = 0
      while (r3 < d) {
        if (r3 != colIdx) {
          val f = m(r3)(colIdx) / m(colIdx)(colIdx)
          var c2 = colIdx
          while (c2 <= d) { m(r3)(c2) -= f * m(colIdx)(c2); c2 += 1 }
        }
        r3 += 1
      }
      colIdx += 1
    }
    val sol = Array.tabulate(d)(i => m(i)(d) / m(i)(i))
    LinearModel(sol(0), sol.drop(1))
  }

  /** Adapt a model to the backtest loop (reference inference loop):
    * target position = +`unit` when the model's score exceeds the
    * current price (expected up-move), else -`unit`. Feature values are
    * read by column index in `featureCols` order; a row with a null or
    * NaN feature (or a NaN prediction) targets position 0.0 — flat, a
    * deterministic no-signal stance (holding would need a stateful
    * strategy; `Backtester.Strategy` is a pure row function). */
  def modelStrategy(model: Model, schema: Seq[String],
      featureCols: Seq[String], priceCol: String,
      unit: Double = 1.0): Backtester.Strategy = {
    val fIdx = featureCols.map(schema.indexOf(_)).toArray
    val pIdx = schema.indexOf(priceCol)
    require(fIdx.forall(_ >= 0) && pIdx >= 0,
      s"columns $featureCols / $priceCol not all present in $schema")
    (r: Row) => {
      val x = new Array[Double](fIdx.length)
      var ok = true
      var i = 0
      while (i < fIdx.length) {
        if (r.isNullAt(fIdx(i))) ok = false
        else { x(i) = r.getDouble(fIdx(i)); if (x(i).isNaN) ok = false }
        i += 1
      }
      if (!ok) 0.0
      else {
        val pred = model.predict(x)
        if (pred.isNaN) 0.0
        else if (pred > r.getDouble(pIdx)) unit
        else -unit
      }
    }
  }

  /** Feature-matrix export, LibSVM text (XGBoost native input):
    * `label idx:value ...` with 1-based indices, one shuffle-free pass
    * (file count = input partitions, rows in source-partition order —
    * sort the input first if per-file ordering matters). Null/NaN rows
    * are dropped. */
  def exportLibsvm(df: DataFrame, featureCols: Seq[String], labelCol: String,
      path: String): Unit = {
    val line = concat_ws(" ",
      (col(labelCol).cast("double").cast("string") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          concat_ws(":", lit(i + 1), col(c).cast("double").cast("string"))
        }): _*)
    val notNull = (featureCols :+ labelCol)
      .map(c => col(c).isNotNull && !isnan(col(c).cast("double")))
      .reduce(_ && _)
    df.filter(notNull).select(line.as("value")).write.mode("overwrite").text(path)
  }

  /** Feature-matrix export, parquet: (label, features array<double>) —
    * full-fidelity handoff for downstream learners. */
  def exportMatrix(df: DataFrame, featureCols: Seq[String], labelCol: String,
      path: String): Unit =
    df.select(col(labelCol).cast("double").as("label"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("features"))
      .write.mode("overwrite").parquet(path)
}
