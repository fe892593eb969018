package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * `functions.aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates the
  * lambda per element interpreted (higher-order functions never enter
  * whole-stage codegen), which dominates brute-force similarity scans.
  * This expression generates a tight primitive loop instead, keeping the
  * whole scan inside WholeStageCodegen — the difference between an
  * interpreted 34M-lambda plan and a vectorizable loop at 100 TB scale.
  *
  * Supports ARRAY<DOUBLE> and ARRAY<FLOAT> children (mixed is fine); null
  * elements are treated as 0 contribution is NOT supported — embeddings
  * are dense, and null elements would be a data bug upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double>/array<float>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left.dataType)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object VectorFunctions {
  /** Codegen'd dot product of two dense vector columns. */
  def dotProduct(a: Column, b: Column): Column =
    shim.column(DotProduct(shim.expression(a), shim.expression(b)))

  def l2Norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotProduct(a, a))
}
