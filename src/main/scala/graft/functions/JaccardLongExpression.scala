package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Jaccard similarity of two DISTINCT-element long arrays (hashed shingle
  * sets): |A∩B| / (|A| + |B| - |A∩B|), 0.0 when either side is empty —
  * the exact semantics of PortableSql.jaccard, which stays the DuckDB
  * oracle form. Computed by sorting copies and merge-counting, so the
  * per-pair cost in a candidate-verify join is two small sorts instead
  * of an interpreted set-intersect with per-element hashing. Integer
  * counting → exact, engine-identical.
  */
object JaccardLongKernel {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    if (x.length == 0 || y.length == 0) 0.0
    else {
      java.util.Arrays.sort(x) // toLongArray copies; sorting is local
      java.util.Arrays.sort(y)
      var i = 0
      var j = 0
      var inter = 0
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
        else if (x(i) < y(j)) i += 1
        else j += 1
      }
      inter.toDouble / (x.length + y.length - inter)
    }
  }
}

case class JaccardLongExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardLongKernel.jaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Static-kernel codegen (JaroWinklerKernel precedent) — the verify
    * joins' filter stays inside one whole-stage-codegen span instead of
    * the CodegenFallback span split.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardLongKernel.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardLongExpression {
  def jaccard(a: Column, b: Column): Column =
    SqlBridge.column(
      JaccardLongExpression(SqlBridge.expression(a), SqlBridge.expression(b)))
}
