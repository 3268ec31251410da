package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x(i) * y(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {
  def dot(a: Column, b: Column): Column =
    SqlBridge.column(
      DotProductExpression(SqlBridge.expression(a), SqlBridge.expression(b)))
}
