package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * compilation. Here the planes are built ONCE per (nTables, bits, dim)
  * config per JVM from the same integer recurrence as
  * PortableSql.pseudoUniform, and the dot products run as tight primitive
  * loops. The arithmetic — plane component values, left-to-right
  * accumulation of x*y products, `> 0` sign test — is exactly the SQL
  * form's, so results stay bit-identical to the DuckDB oracle's symbolic
  * evaluation (JVM FP is strict; no FMA fusion reorders the adds).
  *
  * Codegen is a static kernel call (the JaroWinklerKernel precedent): one
  * virtual call per ROW replaces thousands of interpreted expression-node
  * evaluations, and — unlike the r19 CodegenFallback form — the hosting
  * Project stays inside its whole-stage-codegen span.
  */
object SrpKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(nTables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nTables, bits, dim), { key =>
      val (t, b, d) = key
      Array.tabulate(t * b) { p =>
        Array.tabulate(d) { i =>
          val seed = p.toLong * 97L + i
          ((seed * 2654435761L) % 1000003L) / 1000003.0 - 0.5
        }
      }
    })

  def buckets(input: ArrayData, nTables: Int, bits: Int, dim: Int): ArrayData = {
    val pl = planes(nTables, bits, dim)
    val v = input.toDoubleArray()
    val n = math.min(dim, v.length)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var j = 0
      while (j < bits) {
        val plane = pl(t * bits + j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v(i) * plane(i)
          i += 1
        }
        if (acc > 0) b |= (1L << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class SrpBucketsExpression(child: Expression, nTables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  override protected def nullSafeEval(input: Any): Any =
    SrpKernel.buckets(input.asInstanceOf[ArrayData], nTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpKernel.buckets($c, $nTables, $bits, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucketsExpression {
  def buckets(vn: Column, nTables: Int, bits: Int, dim: Int): Column =
    SqlBridge.column(
      SrpBucketsExpression(SqlBridge.expression(vn), nTables, bits, dim))
}
