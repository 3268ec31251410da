package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays as one tight primitive loop.
  *
  * Exists for performance on the similarity-search hot paths: the SQL
  * form `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)`
  * is interpreted per element (and allocates the zipped array); a
  * candidate-pair verify join evaluates it once per pair. The
  * accumulation order (left-to-right adds of x*y products, strict JVM
  * FP, no FMA) is identical to the SQL form's, so results stay
  * bit-identical to the DuckDB oracle's `list_dot_product`.
  */
object DotProductKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x(i) * y(i)
      i += 1
    }
    acc
  }
}

case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Static-kernel codegen (JaroWinklerKernel precedent) — keeps the
    * candidate-verify joins' filters/projects inside one
    * whole-stage-codegen span instead of the CodegenFallback span split.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductKernel.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {
  def dot(a: Column, b: Column): Column =
    SqlBridge.column(
      DotProductExpression(SqlBridge.expression(a), SqlBridge.expression(b)))
}
