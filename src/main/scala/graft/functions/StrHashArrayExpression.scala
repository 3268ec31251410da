package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PortableSql.strHash applied to every element of a string array, as one
  * tight loop per row.
  *
  * Exists for performance on the dedup hot paths: the symbolic form is a
  * higher-order `transform` whose lambda inlines 16 substr/ascii calls
  * per element, all interpreted — the dominant per-doc cost of the
  * minhash/simhash signature builds. The arithmetic here is the
  * IDENTICAL base-127 polynomial over the first 16 characters salted
  * with the length, mod 1e9+7 — the corpus is ASCII, where
  * `ascii(substr(w, i, 1))` equals `charAt(i-1)` — so the DuckDB oracle
  * keeps evaluating the symbolic form and results match exactly.
  */
/** THE imperative strHash: base-127 polynomial over the first 16 chars
  * salted with length, mod 1e9+7 — the single shared copy every fused
  * kernel calls. Bit-exact agreement with PortableSql.strHash's symbolic
  * form is load-bearing for every dedup/fingerprint oracle; keeping one
  * copy means a tweak cannot silently desynchronize the kernels.
  * (Public so generated whole-stage code can call it statically.)
  */
object StrHashKernel {
  val P: Long = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < 16) {
      val c = if (i < s.length) s.charAt(i).toLong else 0L
      acc = (acc * 127 + c) % P
      i += 1
    }
    (acc * 31 + s.length) % P
  }

  def hashArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      out(k) = hash(arr.getUTF8String(k).toString)
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class StrHashArrayExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "str_hash_array"

  override protected def nullSafeEval(input: Any): Any =
    StrHashKernel.hashArray(input.asInstanceOf[ArrayData])

  /** Static-kernel codegen (JaroWinklerKernel precedent) — keeps the
    * hosting Project inside the whole-stage-codegen span instead of the
    * CodegenFallback span split.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrHashKernel.hashArray($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StrHashArrayExpression {
  def hashes(arr: Column): Column =
    SqlBridge.column(StrHashArrayExpression(SqlBridge.expression(arr)))
}
