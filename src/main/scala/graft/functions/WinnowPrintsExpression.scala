package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing selection over a hash array — each w-window's minimum,
  * deduplicated in first-occurrence order — as one tight loop per row
  * (r19 optimization).
  *
  * The symbolic form (TextOps.winnowSql: `array_distinct(transform(
  * sequence(1, n-w+1), i -> array_min(slice(hs, i, w))))` with the <w
  * and empty guards) is interpreted and allocates a w-slice per window —
  * O(n·w) boxed work per document on the winnow queries' hot path. This
  * kernel emits the IDENTICAL array (window minima left to right, first
  * occurrence kept; the whole-array minimum when 0 < n < w; empty when
  * n = 0), so the DuckDB oracle keeps evaluating the symbolic form.
  */
object WinnowPrintsKernel {
  def compute(input: ArrayData, w: Int): ArrayData = {
    val hs = input.toLongArray()
    val n = hs.length
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else if (n < w) {
      var m = hs(0); var i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      new GenericArrayData(Array(m))
    } else {
      val seen = mutable.LinkedHashSet.empty[Long]
      var i = 0
      while (i <= n - w) {
        var m = hs(i); var j = i + 1
        while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
        seen += m
        i += 1
      }
      new GenericArrayData(seen.toArray)
    }
  }
}

case class WinnowPrintsExpression(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_prints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowPrintsKernel.compute(input.asInstanceOf[ArrayData], w)

  /** Static-kernel codegen (JaroWinklerKernel precedent) — keeps the
    * hosting Project inside the whole-stage-codegen span instead of the
    * r19 CodegenFallback span split.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowPrintsKernel.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPrintsExpression {
  def prints(hs: Column, w: Int): Column =
    SqlBridge.column(WinnowPrintsExpression(SqlBridge.expression(hs), w))
}
