package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
case class JaccardLongExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardLongExpression {
  def jaccard(a: Column, b: Column): Column =
    SqlBridge.column(
      JaccardLongExpression(SqlBridge.expression(a), SqlBridge.expression(b)))
}
