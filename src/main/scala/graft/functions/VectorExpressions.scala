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

object VectorExpressions {

  /** Register `graft_dot` on the session (Column + SQL surface). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Column API for the registered function (resolution happens at
    * analysis against the session's registry — call `register` first).
    */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
}
