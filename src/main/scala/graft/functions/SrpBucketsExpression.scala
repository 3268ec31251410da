package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-random-projection bucket ids of a unit vector, as one
  * `array<long>` of `nTables` entries — bit j of table t is
  * sign(v . plane_{t*bits+j}).
  *
  * Exists for performance: the SQL formulation is either a non-foldable
  * higher-order chain (rebuilt and interpreted per row) or `nTables*bits`
  * inlined 64-literal arrays whose generated code takes seconds of Janino
  * compilation. Here the planes are built ONCE per expression instance
  * from the same integer recurrence as PortableSql.pseudoUniform, and the
  * dot products run as tight primitive loops. The arithmetic — plane
  * component values, left-to-right accumulation of x*y products, `> 0`
  * sign test — is exactly the SQL form's, so results stay bit-identical
  * to the DuckDB oracle's symbolic evaluation (JVM FP is strict; no FMA
  * fusion reorders the adds).
  *
  * CodegenFallback is deliberate: the surrounding plan stage is a plain
  * projection and one virtual call per ROW replaces thousands of
  * interpreted expression-node evaluations.
  */
case class SrpBucketsExpression(child: Expression, nTables: Int, bits: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nTables * bits) { p =>
      Array.tabulate(dim) { i =>
        val seed = p.toLong * 97L + i
        ((seed * 2654435761L) % 1000003L) / 1000003.0 - 0.5
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(dim, v.length)
    val buckets = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var j = 0
      while (j < bits) {
        val plane = planes(t * bits + j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v(i) * plane(i)
          i += 1
        }
        if (acc > 0) b |= (1L << j)
        j += 1
      }
      buckets(t) = b
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucketsExpression {
  def buckets(vn: Column, nTables: Int, bits: Int, dim: Int): Column =
    SqlBridge.column(
      SrpBucketsExpression(SqlBridge.expression(vn), nTables, bits, dim))
}
