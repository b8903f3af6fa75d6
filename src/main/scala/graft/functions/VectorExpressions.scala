package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native Catalyst expression for the ANN hot path: left-to-right dot
  * product over two numeric arrays, accumulated in double.
  *
  * Why a custom Expression (SURVEY §4 preference (b)): the
  * `zip_with + aggregate` higher-order formulation allocates a lambda
  * frame per element; this compiles to a tight primitive loop inside
  * whole-stage codegen. The fold order and double arithmetic are
  * IDENTICAL to the higher-order version (and the DuckDB oracle's
  * `list_dot_product` on DOUBLE[]), so swapping it in cannot change
  * results — only speed.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // only the element types both eval paths actually read — admitting
    // int/long arrays here would CCE (interpreted) or read with the
    // wrong stride (codegen)
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got " +
          s"${left.dataType} / ${right.dataType} (cast integer arrays first)")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val at = elemType(left)
    val bt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = at match {
        case FloatType => a.getFloat(i).toDouble
        case _ => a.getDouble(i)
      }
      val y = bt match {
        case FloatType => b.getFloat(i).toDouble
        case _ => b.getDouble(i)
      }
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = elemType(left) match {
      case FloatType => (v: String, i: String) => s"(double) $v.getFloat($i)"
      case _ => (v: String, i: String) => s"$v.getDouble($i)"
    }
    val bGet = elemType(right) match {
      case FloatType => (v: String, i: String) => s"(double) $v.getFloat($i)"
      case _ => (v: String, i: String) => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${aGet(a, i)} * ${bGet(b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All SRP-LSH table buckets of an embedding in ONE codegen'd pass:
  * output[t] is the `bits`-bit bucket of hash table t (bit j set iff
  * the left-to-right double dot of the input with seeded hyperplane
  * (t, j) is >= 0). Arithmetic is bit-identical to composing
  * `graft_dot` per plane (same fold order, same sign rule, same
  * java.util.Random(seed + t) plane generation) — this exists because
  * the composed form evaluates tables x bits separate expression trees
  * per row, whose per-call overhead dominates the actual flops.
  */
case class SrpBuckets(child: Expression, bits: Int, tables: Int, dim: Int,
    seed: Long) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_srp needs array<float|double> input, got $t")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  /** Flattened plane matrix [(t*bits + j)*dim + i], identical values to
    * Similarity.hyperplanes(bits, dim, seed + t) for each table t. */
  @transient lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      val rnd = new java.util.Random(seed + t)
      var k = 0
      while (k < bits * dim) {
        out(t * bits * dim + k) = if (rnd.nextBoolean()) 1.0 else -1.0
        k += 1
      }
      t += 1
    }
    out
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](tables)
    val fl = isFloat
    var t = 0
    while (t < tables) {
      var bkt = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = if (fl) a.getFloat(i).toDouble else a.getDouble(i)
          acc += x * planes(base + i)
          i += 1
        }
        if (acc >= 0) bkt |= 1L << j
        j += 1
      }
      out(t) = bkt
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bkt = ctx.freshName("bkt")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bkt = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ${get(a, i)} * $planesRef[$base + $i];
         |    }
         |    if ($acc >= 0) $bkt |= 1L << $j;
         |  }
         |  $out[$t] = $bkt;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Int8-style scalar quantization of the L2-NORMALIZED vector, in one
  * codegen'd pass: out[i] = (long)(x[i] * levels / ||x||), truncation
  * toward zero (Java double->long narrowing == DuckDB trunc + CAST), a
  * zero vector quantizes to all zeros. One pass computes the norm (the
  * same left-to-right double fold as graft_dot(x, x)) and the codes —
  * a `transform` lambda referencing a projected norm column would be
  * re-inlined by CollapseProject into an O(dim^2) per-row plan (the
  * known Catalyst trap), which this expression structurally avoids.
  *
  * Why quantize at 100 TB: a 64-dim FLOAT embedding is 256 bytes/row;
  * the int8 codes are 64 (stored compactly). Brute-force scoring is
  * memory-bandwidth-bound, so SQ roughly quarters scan cost, and the
  * integer dot products that rank candidates are EXACT (bounded by
  * dim * levels^2 << 2^63) — ranking needs no float tie discipline at
  * all, which is also what makes the DuckDB oracle trivially portable.
  */
case class QuantizeVec(child: Expression, levels: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_quantize needs array<float|double> input, got $t")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  private def isFloat = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (fl) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    val nrm = math.sqrt(acc)
    val out = new Array[Long](n)
    if (nrm != 0.0) {
      i = 0
      while (i < n) {
        val x = if (fl) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = (x * levels / nrm).toLong
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = ${get(a, i)};
         |  $acc += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |long[] $out = new long[$n];
         |if ($nrm != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) (${get(a, i)} * $levels / $nrm);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product over two array<long> columns — the
  * ranking kernel for quantized similarity. Caller guarantees the
  * no-overflow bound (|element| <= levels, so |sum| <= dim * levels^2;
  * 64 * 127^2 ~ 1e6 for the SQ path — far under 2^63). */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_idot needs array<long> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register `graft_dot` + `graft_srp` + `graft_quantize` +
    * `graft_idot` on the session (Column + SQL surface). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp", exprs => SrpBuckets(exprs(0),
        exprs(1).eval().toString.toInt, exprs(2).eval().toString.toInt,
        exprs(3).eval().toString.toInt, exprs(4).eval().toString.toLong),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantize", exprs => QuantizeVec(exprs(0),
        exprs(1).eval().toString.toInt), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_idot", exprs => IntDotProduct(exprs(0), exprs(1)), "built-in")
  }

  /** Column API for the registered function (resolution happens at
    * analysis against the session's registry — call `register` first).
    */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)

  /** Column API for graft_srp: array<long> of per-table SRP buckets. */
  def srp_buckets(emb: Column, bits: Int, tables: Int, dim: Int,
      seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_srp", emb,
      lit(bits), lit(tables), lit(dim), lit(seed))
  }

  /** Column API for graft_quantize: array<long> int8-range codes of the
    * L2-normalized input. */
  def quantize_vec(emb: Column, levels: Int): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_quantize", emb,
      lit(levels))
  }

  /** Column API for graft_idot: exact Long dot of two array<long>. */
  def int_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_idot", a, b)
}
