package graft.consumers

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  // ------------------------------------------------------------------
  // Depth-bounded EXACT regression tree (r16) — the nonlinear trainer
  // leg. The reference's trainer fits XGBoost over the FeatureLabelSet
  // (svoe trainer/trainer_manager.py:11 XGBoostTrainer import, :21-40
  // XGBoostParams, :128-141 _build_xgboost_trainer); this is the
  // exactly-replayable core of that semantics — a greedy histogram
  // tree whose every comparison is integer arithmetic, so the fit is
  // bit-identical across engines and partitionings and sits under the
  // driver's exact-hash oracle (ml_tree_fit). [[fitGBT]] below is the
  // full-strength MLlib boosted-tree leg, spec-pinned against it.
  //
  // Determinism rules (the cramerMicroWeights3 discipline, tree
  // edition):
  //  - features and label must be INTEGER-VALUED (asserted in the
  //    level-0 aggregation pass, zero extra scans); label >= 0 so that
  //    integer division is floor == trunc in both engines;
  //  - node prediction = integer-truncated mean, pred_micros =
  //    (sum_y * 1e6) // n;
  //  - split score = SSE_L + SSE_R where a group's SSE uses the
  //    integer-truncated mean m = sum // cnt:
  //    sse = sumsq - 2*m*sum + m*m*cnt — an exact integer, so argmin
  //    with the total tie order (sse, featureIdx, threshold) replays
  //    in SQL (this is the documented deviation from variance-gain
  //    CART, the same canonicalization move as bucket-vs-elapsed
  //    sampling);
  //  - candidates = the feature's distinct values present in the node
  //    minus its max (left: f <= v, right: f > v — both nonempty by
  //    construction); a node with no candidate becomes a leaf early.
  //
  // Scale shape (the XGBoost histogram approach): one distributed
  // groupBy (node, featureIdx, value) pass PER LEVEL — map-side
  // combinable, result bounded by nodes x features x distinct values,
  // collected to the driver for the prefix-sum scan and exact BigInt
  // argmin. maxDepth scans of the input total; persist the frame
  // upstream if it is not a cheap re-read. CONTINUOUS features must be
  // pre-bucketized by the caller (floor to a grid) — the same cap
  // discipline as the BPE merge tables; `maxAggRows` guards the
  // collect loudly.
  // ------------------------------------------------------------------

  /** One fitted tree node; heap numbering (root 1, children 2n/2n+1).
    * `feature`/`threshold` empty = leaf. `sse` is the node's OWN
    * integer-mean SSE (not the split gain). */
  final case class TreeNodeRow(node: Long, depth: Int, n: Long, sumY: Long,
      sse: Long, feature: Option[String], threshold: Option[Long]) {
    def isLeaf: Boolean = feature.isEmpty
    def predMicros: Long = ((BigInt(sumY) * 1000000L) / n).toLong
  }

  /** A fitted depth-bounded regression tree. `predict` returns
    * pred_micros / 1e6 (the [[Model]] contract); exact consumers use
    * [[predictMicros]] / [[predictColumn]]. */
  final case class TreeModel(featureCols: Seq[String],
      nodes: Map[Long, TreeNodeRow]) extends Model {

    private val fIdx: Map[String, Int] = featureCols.zipWithIndex.toMap

    def predictMicros(features: Array[Double]): Long = {
      var id = 1L
      var row = nodes(id)
      while (!row.isLeaf) {
        id = if (features(fIdx(row.feature.get)) <= row.threshold.get.toDouble)
          id * 2 else id * 2 + 1
        row = nodes(id)
      }
      row.predMicros
    }

    def predict(features: Array[Double]): Double =
      predictMicros(features) / 1e6

    /** The tree as ONE nested CASE expression over the input columns —
      * the distributed scorer: codegen'd, zero shuffle, depth
      * comparisons per row. Returns pred_micros (LongType). */
    def predictColumn: Column = {
      def expr(id: Long): Column = {
        val row = nodes(id)
        if (row.isLeaf) lit(row.predMicros)
        else when(col(row.feature.get) <= lit(row.threshold.get),
          expr(id * 2)).otherwise(expr(id * 2 + 1))
      }
      expr(1L)
    }

    /** Leaf value in the LABEL'S OWN integer scale — floor mean
      * `sum_y / n` (both nonneg under the fit contract, so `/` = floor
      * = DuckDB `//`). The boosting contribution unit ([[fitBoosted]]);
      * [[predMicros]] is the micro-scaled variant single trees grade
      * under. */
    def leafUnit(id: Long): Long = {
      val r = nodes(id)
      r.sumY / r.n
    }

    /** The tree as ONE nested CASE over the input columns, leaves in
      * unit scale ([[leafUnit]]) — the distributed boosting scorer. */
    def leafUnitColumn: Column = {
      def go(id: Long): Column = {
        val row = nodes(id)
        if (row.isLeaf) lit(leafUnit(id))
        else when(col(row.feature.get) <= lit(row.threshold.get),
          go(id * 2)).otherwise(go(id * 2 + 1))
      }
      go(1L)
    }

    /** The fit as a frame — the graded/registry surface: one row per
      * node, all-integer columns (ml_tree_fit's oracle shape). */
    def treeFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      nodes.values.toSeq.sortBy(_.node)
        .map(r => (r.node, r.depth.toLong, r.n, r.sumY, r.sse,
          r.feature.orNull, r.threshold.map(Long.box).orNull,
          r.predMicros, r.isLeaf))
        .toDF("node", "depth", "n", "sum_y", "sse", "feature",
          "threshold", "pred_micros", "is_leaf")
    }
  }

  /** Rebuild a [[TreeModel]] from its [[TreeModel.treeFrame]] rows —
    * the registry read path. */
  def treeFromRows(featureCols: Seq[String], rows: Seq[Row]): TreeModel =
    TreeModel(featureCols, rows.map { r =>
      val node = TreeNodeRow(r.getLong(r.fieldIndex("node")),
        r.getLong(r.fieldIndex("depth")).toInt,
        r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_y")),
        r.getLong(r.fieldIndex("sse")),
        Option(r.getAs[String]("feature")),
        if (r.isNullAt(r.fieldIndex("threshold"))) None
        else Some(r.getLong(r.fieldIndex("threshold"))))
      node.node -> node
    }.toMap)

  private def intSse(c: Long, sy: BigInt, syy: BigInt): BigInt = {
    val m = sy / c // sy >= 0 asserted: floor == trunc
    syy - 2 * m * sy + m * m * c
  }

  /** Fit the exact tree — see the block comment above for semantics
    * and scale shape. `maxDepth` split levels; leaves at depth <=
    * maxDepth. */
  def fitTree(df: DataFrame, featureCols: Seq[String], labelCol: String,
      maxDepth: Int, maxAggRows: Int = 1 << 22): TreeModel =
    fitTreeMin(df, featureCols, labelCol, maxDepth, maxAggRows)._1

  /** [[fitTree]] plus, at zero extra scans, `min(label - leafUnit)`
    * over the fitted assignment — the NEXT boosting round's shift
    * offset ([[fitBoosted]]'s per-round `min(resid)` aggregation,
    * folded into the fit's own histogram passes; r16 optimization,
    * guide §1.2/2.4 — one fewer corpus pass per round, exactly equal
    * because a global min is the min of per-leaf mins).
    *
    * The fit itself runs `maxDepth` histogram passes, not
    * `maxDepth + 1`: the last level's leaf stats (n, sum, sumsq, min)
    * are DERIVED on the driver from the parent level's histogram —
    * the rows of a child node are exactly the parent's (feature*,
    * value) histogram rows on the chosen side of the threshold, so
    * the child's aggregates are partial sums the prefix scan already
    * walks. Bit-identical node rows (same integer sums, same tie
    * order), one fewer distributed pass per tree. */
  private[graft] def fitTreeMin(df: DataFrame, featureCols: Seq[String],
      labelCol: String, maxDepth: Int,
      maxAggRows: Int = 1 << 22): (TreeModel, Long) = {
    require(featureCols.nonEmpty && maxDepth >= 0,
      s"bad tree spec ($featureCols, depth $maxDepth)")
    val k = featureCols.size
    val feats = featureCols.map(c => col(c).cast("double").as(c))
    val yc = col(labelCol).cast("double")
    // integer/nonneg contract, asserted inside level 0's aggregation:
    // any null/NaN/fractional feature, or null/NaN/fractional/negative
    // label, trips the flag. Evaluated on the STACKED rows — every
    // feature value flows through __v, so checking (__v, __y) covers
    // all features without re-projecting them past the generator.
    val badExpr =
      col("__v").isNull || isnan(col("__v")) || col("__v") =!= floor(col("__v")) ||
        col("__y").isNull || isnan(col("__y")) ||
        col("__y") =!= floor(col("__y")) || col("__y") < 0
    val base = df.select((feats :+ yc.as("__y")): _*)
    val stackExpr = org.apache.spark.sql.functions.expr(
      s"stack($k, ${featureCols.zipWithIndex
        .map { case (c, i) => s"$i, `$c`" }.mkString(", ")}) AS (__fi, __v)")

    var nodes = Map.empty[Long, TreeNodeRow]
    // per-leaf min(__y), filled as leaves are fixed — early leaves from
    // their own histogram slice, last-level children from the parent's
    val leafMin = scala.collection.mutable.Map.empty[Long, Long]

    if (maxDepth == 0) {
      // leaf-only tree: one stats pass (no candidate histogram needed)
      val r = base.agg(count(lit(1)).as("c"),
        sum(col("__y").cast("long")).as("sy"),
        sum(col("__y").cast("long") * col("__y").cast("long")).as("syy"),
        min(col("__y").cast("long")).as("mn")).collect()(0)
      require(!r.isNullAt(0) && r.getLong(0) > 0, "fitTree over an empty frame")
      val (c, sy, syy) = (r.getLong(0), r.getLong(1), r.getLong(2))
      nodes += 1L -> TreeNodeRow(1L, 0, c, sy, intSse(c, sy, syy).toLong,
        None, None)
      leafMin(1L) = r.getLong(3)
    }

    var frontier: Set[Long] = if (maxDepth == 0) Set.empty else Set(1L)
    var assign: Column = lit(1L)
    var depth = 0
    while (depth < maxDepth && frontier.nonEmpty) {
      val lastLevel = depth == maxDepth - 1
      val withBad = depth == 0
      val aggCols = Seq(count(lit(1)).as("c"),
        sum(col("__y").cast("long")).as("sy"),
        sum(col("__y").cast("long") * col("__y").cast("long")).as("syy"),
        min(col("__y").cast("long")).as("mn")) ++
        (if (withBad) Seq(max(badExpr.cast("int")).as("bad")) else Nil)
      val agg = base
        .select(assign.as("__node"), col("__y"), stackExpr)
        .filter(col("__node").isInCollection(frontier))
        .groupBy(col("__node"), col("__fi"),
          col("__v").cast("long").as("__v"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      require(agg.length <= maxAggRows,
        s"tree histogram has ${agg.length} (node, feature, value) rows " +
          s"> maxAggRows=$maxAggRows — pre-bucketize continuous features")
      if (withBad)
        require(!agg.exists(r => r.getInt(r.fieldIndex("bad")) > 0),
          "fitTree needs integer-valued features and a nonnegative " +
            "integer-valued label (the exact-oracle contract)")
      // driver: per (node, fi) prefix scan over sorted values
      // tuple: (node, fi, v, c, sy, syy, mn)
      val byNode = agg.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .groupBy(_._1)
      require(depth > 0 || byNode.nonEmpty, "fitTree over an empty frame")
      val nextFrontier = scala.collection.mutable.Set.empty[Long]
      // children of a split are nonempty by construction, so every
      // frontier node has histogram rows
      frontier.foreach { id =>
        val grp = byNode(id)
        val f0 = grp.filter(_._2 == 0)
        val c = f0.map(_._4).sum
        val sy = f0.map(t => BigInt(t._5)).sum
        val syy = f0.map(t => BigInt(t._6)).sum
        val mn = f0.map(_._7).min
        var best: Option[(BigInt, Int, Long)] = None
        (0 until k).foreach { fi =>
          var cl = 0L
          var syl = BigInt(0)
          var syyl = BigInt(0)
          val vals = grp.filter(_._2 == fi).sortBy(_._3)
          vals.dropRight(1).foreach { case (_, _, v, vc, vsy, vsyy, _) =>
            cl += vc; syl += vsy; syyl += vsyy
            val sc = intSse(cl, syl, syyl) +
              intSse(c - cl, sy - syl, syy - syyl)
            val cand = (sc, fi, v)
            if (best.isEmpty ||
                Ordering[(BigInt, Int, Long)].lt(cand, best.get))
              best = Some(cand)
          }
        }
        best match {
          case Some((_, fi, v)) =>
            nodes += id -> TreeNodeRow(id, depth, c, sy.toLong,
              intSse(c, sy, syy).toLong, Some(featureCols(fi)), Some(v))
            if (lastLevel) {
              // the children are depth-maxDepth leaves: their stats are
              // partial sums of THIS histogram's (fi, v) rows — no
              // final leaf-stats pass needed
              val fvals = grp.filter(_._2 == fi).sortBy(_._3)
              val lrows = fvals.filter(_._3 <= v)
              val cL = lrows.map(_._4).sum
              val syL = lrows.map(t => BigInt(t._5)).sum
              val syyL = lrows.map(t => BigInt(t._6)).sum
              val mnL = lrows.map(_._7).min
              val rrows = fvals.filter(_._3 > v)
              val cR = c - cL
              val syR = sy - syL
              val syyR = syy - syyL
              val mnR = rrows.map(_._7).min
              nodes += (id * 2) -> TreeNodeRow(id * 2, depth + 1, cL,
                syL.toLong, intSse(cL, syL, syyL).toLong, None, None)
              leafMin(id * 2) = mnL
              nodes += (id * 2 + 1) -> TreeNodeRow(id * 2 + 1, depth + 1, cR,
                syR.toLong, intSse(cR, syR, syyR).toLong, None, None)
              leafMin(id * 2 + 1) = mnR
            } else {
              nextFrontier += id * 2
              nextFrontier += id * 2 + 1
            }
          case None => // single-valued on every feature: early leaf
            nodes += id -> TreeNodeRow(id, depth, c, sy.toLong,
              intSse(c, sy, syy).toLong, None, None)
            leafMin(id) = mn
        }
      }
      frontier = nextFrontier.toSet
      // extend the assignment walk with this level's splits
      val partial = TreeModel(featureCols, nodes)
      def assignExpr(id: Long, d: Int): Column =
        partial.nodes.get(id) match {
          case Some(r) if !r.isLeaf =>
            when(col(r.feature.get) <= lit(r.threshold.get),
              assignExpr(id * 2, d + 1)).otherwise(assignExpr(id * 2 + 1, d + 1))
          case _ => lit(id)
        }
      assign = assignExpr(1L, 0)
      depth += 1
    }
    val model = TreeModel(featureCols, nodes)
    // min over rows of (__y - leafUnit(leaf(x))) = min over leaves of
    // (min __y in leaf - leafUnit) — the next round's exact offset
    val nextMin = leafMin.map { case (id, m) => m - model.leafUnit(id) }.min
    (model, nextMin)
  }

  /** The EXACT boosted ensemble — gradient boosting with squared loss
    * over [[fitTree]], kept bit-replayable end to end (the graded twin
    * of [[fitGBT]]'s float MLlib fit; designed + cross-checked in
    * tools/design_boost.py, DuckDB CTE chain == pure-python replay,
    * BEFORE this implementation existed). `base` is the corpus integer
    * floor mean; each round g fits the exact tree to the SHIFTED
    * residual `y - F_{g-1}(x) - off_g` (off_g = corpus min residual —
    * the shift keeps fitTree's nonneg-label contract, and split
    * decisions are shift-invariant because integer-floor means shift
    * exactly by integer offsets), contributing `leafUnit + off_g` at
    * learning rate 1. Predictions are integers in the label's own
    * scale. Convergence is to within INTEGER-FLOOR resolution, not to
    * zero: a leaf whose residuals span {0, 1} has floor mean 0 and
    * stalls — the exact contract trades the last sub-unit of train fit
    * for bit-replayability ([[fitGBT]] is the to-zero float leg). */
  final case class BoostedModel(featureCols: Seq[String], base: Long,
      baseN: Long, baseSumY: Long, baseSse: Long,
      rounds: Seq[(TreeModel, Long)]) extends Model {

    private val fIdx: Map[String, Int] = featureCols.zipWithIndex.toMap

    def predictUnits(features: Array[Double]): Long = {
      var p = base
      rounds.foreach { case (t, off) =>
        var id = 1L
        var row = t.nodes(id)
        while (!row.isLeaf) {
          id = if (features(fIdx(row.feature.get)) <= row.threshold.get.toDouble)
            id * 2 else id * 2 + 1
          row = t.nodes(id)
        }
        p += t.leafUnit(id) + off
      }
      p
    }

    def predict(features: Array[Double]): Double =
      predictUnits(features).toDouble

    /** The whole ensemble as ONE column — base + one nested CASE per
      * round (codegen'd, zero shuffle). Integer (LongType), the
      * label's scale. */
    def predictColumn: Column =
      rounds.foldLeft(lit(base): Column) { case (acc, (t, off)) =>
        acc + t.leafUnitColumn + lit(off)
      }

    /** Gain-based feature importance — the XGBoost `get_score
      * (importance_type='gain')` surface, exactly replayable: per
      * internal node the split's SSE gain is `sse - sse(left) -
      * sse(right)` (all integer node stats from the fit), summed per
      * feature across every round. Gains are shift-invariant (each
      * round's offset cancels in the difference), so the numbers are
      * comparable across rounds. */
    def featureImportance: Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      rounds.foreach { case (t, _) =>
        t.nodes.values.foreach { r =>
          if (!r.isLeaf) {
            val gain = r.sse - t.nodes(r.node * 2).sse -
              t.nodes(r.node * 2 + 1).sse
            acc(r.feature.get) += gain
          }
        }
      }
      acc.toMap
    }

    /** The fit as a frame — the graded/registry surface (ml_boost_fit's
      * oracle shape): round 0 is the base-mean row; rounds 1..R are the
      * per-round tree nodes, `contrib` = leafUnit + round offset. */
    def boostFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      val baseRow = (0L, 1L, 0L, baseN, baseSumY, baseSse,
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long],
        base, true)
      val treeRows = rounds.zipWithIndex.flatMap { case ((t, off), i) =>
        t.nodes.values.toSeq.sortBy(_.node).map { r =>
          (i + 1L, r.node, r.depth.toLong, r.n, r.sumY, r.sse,
            r.feature.orNull, r.threshold.map(Long.box).orNull,
            t.leafUnit(r.node) + off, r.isLeaf)
        }
      }
      (baseRow +: treeRows).toDF("round", "node", "depth", "n", "sum_y",
        "sse", "feature", "threshold", "contrib", "is_leaf")
    }
  }

  /** Fit the exact boosted ensemble — see [[BoostedModel]]. The label
    * must be nonneg integer-valued (the fitTree contract; asserted).
    * `rounds` trees of `maxDepth` split levels each; `1 + rounds *
    * maxDepth` corpus aggregation passes total (r16: the per-round
    * `min(resid)` pass is free — round 1's offset is `min(__y) - base`
    * from the base aggregation, later rounds' offsets ride the
    * previous fit's histogram via [[fitTreeMin]]; and each tree is
    * `maxDepth` passes, not `maxDepth + 1` — same scaladoc). The input
    * is persisted here for the duration of the fit. */
  def fitBoosted(df: DataFrame, featureCols: Seq[String], labelCol: String,
      rounds: Int, maxDepth: Int, maxAggRows: Int = 1 << 22): BoostedModel = {
    require(rounds >= 1, s"fitBoosted needs >= 1 round, got $rounds")
    val feats = featureCols.map(c => col(c).cast("double").as(c))
    val base0 = df.select((feats :+ col(labelCol).cast("long").as("__y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = base0.agg(count(lit(1)).as("n"), sum("__y").as("sy"),
          sum(col("__y") * col("__y")).as("syy"), min("__y").as("mn"))
        .collect()(0)
      require(!a.isNullAt(0) && a.getLong(0) > 0, "fitBoosted over an empty frame")
      val (n, sy, syy) = (a.getLong(0), a.getLong(1), a.getLong(2))
      require(a.getLong(3) >= 0,
        "fitBoosted needs a nonnegative integer label (the exact contract)")
      val base = sy / n // nonneg: trunc == floor == DuckDB //
      var fitted = Vector.empty[(TreeModel, Long)]
      var predCol: Column = lit(base)
      // min(__y - base) = min(__y) - base: round 1's offset needs no pass
      var off = a.getLong(3) - base
      (1 to rounds).foreach { _ =>
        val resid = col("__y") - predCol
        val shifted = base0.withColumn("__b", resid - lit(off))
        val (t, nextMin) =
          fitTreeMin(shifted, featureCols, "__b", maxDepth, maxAggRows)
        fitted :+= ((t, off))
        predCol = predCol + t.leafUnitColumn + lit(off)
        // next resid = __b - leafUnit (the offsets cancel), so the fit's
        // per-leaf mins already hold the next round's exact offset
        off = nextMin
      }
      BoostedModel(featureCols, base, n, sy, intSse(n, BigInt(sy),
        BigInt(syy)).toLong, fitted)
    } finally { base0.unpersist(); () }
  }

  // ------------------------------------------------------------------
  // Tuner — the reference TrainerManager's hyperparameter-search slice
  // (svoe trainer_manager.py: TunerConfig / param_space / num_samples /
  // metric / mode over randint ranges), made exactly replayable:
  // candidates sample DETERMINISTICALLY from the param space via
  // md5-prefix integers keyed by the sample index (data-independent,
  // so the trial list is shared literal metadata with the oracle), fit
  // on the TRAIN split, score by integer SSE on the VALID split, pick
  // argmin (metric, trial). Designed + cross-checked in
  // tools/design_tuner.py.
  // ------------------------------------------------------------------

  /** md5-prefix integer in [0, 2^32) — the repo's engine-portable
    * knob-derivation hash (the Dedup.Md5Prefix discipline). */
  def md5Int(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Inclusive integer range — the `randint: {lower, upper}` shape of
    * the reference's param_space. */
  final case class ParamRange(lower: Int, upper: Int) {
    require(upper >= lower, s"empty range [$lower, $upper]")
    def span: Int = upper - lower + 1
  }

  final case class TunerSpec(rounds: ParamRange, maxDepth: ParamRange,
      numSamples: Int, metric: String = "sse_valid", mode: String = "min")

  final case class Trial(trial: Int, rounds: Int, maxDepth: Int,
      nValid: Long, sseValid: Long, isBest: Boolean)

  /** The deterministic sample list (trial, rounds, maxDepth) — shared
    * verbatim by [[tune]] and the oracle generator. */
  def sampleCandidates(spec: TunerSpec): Seq[(Int, Int, Int)] =
    (0 until spec.numSamples).map { i =>
      (i,
        spec.rounds.lower + (md5Int(s"rounds$i") % spec.rounds.span).toInt,
        spec.maxDepth.lower + (md5Int(s"depth$i") % spec.maxDepth.span).toInt)
    }

  /** Run the tuner: fit one exact ensemble per sampled candidate on
    * the rows where `isTrainCol`, score ALL candidates' integer valid
    * SSE in ONE pass over the rows where `isValidCol` (each model's
    * prediction is a sibling CASE column), elect argmin (sse, trial).
    * Returns (best model, the full trial frame — what the reference's
    * MLflow callback logs per trial). Only the exact surface is
    * supported: metric 'sse_valid', mode 'min' (use fitGBT + your own
    * loop for float metrics). */
  def tune(df: DataFrame, featureCols: Seq[String], labelCol: String,
      isTrainCol: String, isValidCol: String,
      spec: TunerSpec): (BoostedModel, Seq[Trial]) = {
    require(spec.metric == "sse_valid" && spec.mode == "min",
      s"exact tuner supports (sse_valid, min) only, got " +
        s"(${spec.metric}, ${spec.mode})")
    val train = df.filter(col(isTrainCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // SHARED-PREFIX FITS (r16): the exact fit is deterministic and
      // prefix-stable — round g's tree depends only on rounds < g and
      // maxDepth, never on the rounds knob — so candidates sharing a
      // maxDepth share the whole tree sequence. One fitBoosted per
      // DISTINCT depth at that depth's max rounds, each candidate a
      // rounds-prefix slice: identical models (same integer arithmetic,
      // same argmins), fewer corpus passes when the sampler collides
      // on depth (the graded spec's 3 trials hit 2 distinct depths).
      val cands = sampleCandidates(spec)
      val fullByDepth = cands.groupBy(_._3).map { case (d, cs) =>
        d -> fitBoosted(train, featureCols, labelCol, cs.map(_._2).max, d)
      }
      val models = cands.map { case (i, r, d) =>
        val full = fullByDepth(d)
        (i, r, d, full.copy(rounds = full.rounds.take(r)))
      }
      val aggs = models.map { case (i, _, _, m) =>
        val dlt = col(labelCol).cast("long") - m.predictColumn
        sum(dlt * dlt).as(s"sse$i")
      } :+ count(lit(1)).as("n")
      val row = df.filter(col(isValidCol))
        .agg(aggs.head, aggs.tail: _*).collect()(0)
      val trials = models.map { case (i, r, d, _) =>
        Trial(i, r, d, row.getAs[Long]("n"), row.getAs[Long](s"sse$i"),
          isBest = false)
      }
      val best = trials.minBy(t => (t.sseValid, t.trial)).trial
      (models(best)._4, trials.map(t => t.copy(isBest = t.trial == best)))
    } finally { train.unpersist(); () }
  }

  /** One point of an early-stopping / holdout metric series. */
  final case class RoundMetric(round: Int, nValid: Long, sseValid: Long,
      isBest: Boolean)

  /** The XGBoost `early_stopping_rounds` rule as a pure function over
    * a metric series (round 0 = the base model): returns (stop, best)
    * where `best` is the FIRST round achieving the running min and
    * `stop` the first round with `patience` rounds since `best` (or
    * the last round when the rule never fires). */
  def earlyStopRound(series: Seq[Long], patience: Int): (Int, Int) = {
    require(patience >= 1, s"patience must be >= 1, got $patience")
    var best = 0
    var r = 0
    while (r < series.size) {
      if (series(r) < series(best)) best = r
      if (r - best >= patience) return (r, best)
      r += 1
    }
    (series.size - 1, best)
  }

  /** [[fitBoosted]] with XGBoost's early-stopping semantics: fit
    * round by round on the rows where `isTrainCol`, compute the
    * integer valid SSE after each round (rows where `isValidCol`),
    * STOP once `patience` consecutive rounds fail to improve the
    * running best, and return the BEST round's prefix ensemble plus
    * the metric series up to the stop (what the reference's per-round
    * eval callback logs). The decision is inherently sequential — one
    * valid-split aggregation per fitted round; the series, the stop,
    * and the kept prefix are all exactly replayable
    * (tools/design_earlystop.py). */
  def fitBoostedEarlyStop(df: DataFrame, featureCols: Seq[String],
      labelCol: String, isTrainCol: String, isValidCol: String,
      maxRounds: Int, maxDepth: Int, patience: Int = 1,
      maxAggRows: Int = 1 << 22): (BoostedModel, Seq[RoundMetric]) = {
    require(maxRounds >= 1, s"need >= 1 round, got $maxRounds")
    val feats = featureCols.map(c => col(c).cast("double").as(c))
    val all = df.select((feats :+ col(labelCol).cast("long").as("__y") :+
        col(isTrainCol).as("__tr") :+ col(isValidCol).as("__va")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val train = all.filter(col("__tr"))
      val a = train.agg(count(lit(1)).as("n"), sum("__y").as("sy"),
          sum(col("__y") * col("__y")).as("syy"), min("__y").as("mn"))
        .collect()(0)
      require(!a.isNullAt(0) && a.getLong(0) > 0,
        "fitBoostedEarlyStop over an empty train split")
      require(a.getLong(3) >= 0,
        "fitBoostedEarlyStop needs a nonnegative integer label")
      val (n, sy, syy) = (a.getLong(0), a.getLong(1), a.getLong(2))
      var model = BoostedModel(featureCols, sy / n, n, sy,
        intSse(n, BigInt(sy), BigInt(syy)).toLong, Vector.empty)
      def validSse(m: BoostedModel): (Long, Long) = {
        val d = col("__y") - m.predictColumn
        val r = all.filter(col("__va"))
          .agg(count(lit(1)).as("nv"), sum(d * d).as("sse")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      var series = Vector(validSse(model))
      var stopped = false
      var r = 1
      // min(__y - base) over TRAIN = mn - base (r16: the per-round
      // min pass rides the base agg / the previous fit's histogram,
      // exactly as in fitBoosted)
      var off = a.getLong(3) - model.base
      while (r <= maxRounds && !stopped) {
        val resid = col("__y") - model.predictColumn
        val (t, nextMin) = fitTreeMin(
          train.withColumn("__b", resid - lit(off)),
          featureCols, "__b", maxDepth, maxAggRows)
        model = model.copy(rounds = model.rounds :+ ((t, off)))
        off = nextMin
        series :+= validSse(model)
        val (_, best) = earlyStopRound(series.map(_._2), patience)
        if (series.size - 1 - best >= patience) stopped = true
        r += 1
      }
      val (stop, best) = earlyStopRound(series.map(_._2), patience)
      val metrics = (0 to stop).map(k =>
        RoundMetric(k, series(k)._1, series(k)._2, isBest = k == best))
      (model.copy(rounds = model.rounds.take(best)), metrics)
    } finally { all.unpersist(); () }
  }

  /** The full-strength nonlinear leg: MLlib gradient-boosted trees
    * (squared loss) over the same (featureCols, label) surface,
    * wrapped as a [[Model]] — what the reference's XGBoostTrainer
    * slot runs (trainer_manager.py:128-141); [[fitTree]] is its
    * exactly-replayable graded twin. Float fit — spec-pinned
    * (train-MSE monotone in iterations, exact on a separable
    * fixture), not oracle-graded. */
  def fitGBT(df: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int, maxDepth: Int = 3, seed: Long = 41L,
      stepSize: Double = 0.1): GBTModelWrapper = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.GBTRegressor
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
    val prepared = assembler.transform(
      df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
        col(labelCol).cast("double").as("__label")): _*))
    val gbt = new GBTRegressor().setFeaturesCol("__features")
      .setLabelCol("__label").setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setSeed(seed).setStepSize(stepSize)
    GBTModelWrapper(gbt.fit(prepared), featureCols)
  }

  final case class GBTModelWrapper(
      model: org.apache.spark.ml.regression.GBTRegressionModel,
      featureCols: Seq[String]) extends Model {
    def predict(features: Array[Double]): Double =
      model.predict(org.apache.spark.ml.linalg.Vectors.dense(features))
    /** Train MSE over a frame (the spec's monotonicity surface). */
    def trainMse(df: DataFrame, labelCol: String): Double = {
      import org.apache.spark.ml.feature.VectorAssembler
      val assembler = new VectorAssembler()
        .setInputCols(featureCols.toArray).setOutputCol("__features")
      val scored = model.transform(assembler.transform(
        df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
          col(labelCol).cast("double").as("__label")): _*)))
      scored.select(avg(pow(col(model.getPredictionCol) - col("__label"), 2)))
        .head().getDouble(0)
    }
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
