package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native kernels for the dedup sketches, arithmetic-identical to their
  * PortableSql symbolic forms (pure 64-bit integer math, so "identical"
  * is exact, not IEEE-modulo). The symbolic forms remain the DuckDB
  * oracle; these replace K interpreted higher-order passes per document
  * with one tight loop. Both codegen as static kernel calls (the
  * JaroWinklerKernel precedent) so the signature-build Projects stay
  * inside their whole-stage spans.
  */
object SketchKernels {
  private val P = PortableSql.P
  private val A = PortableSql.minhashA.toArray
  private val B = PortableSql.minhashB.toArray

  /** All K minhash values; null for an empty input (matching
    * `array_min(transform(empty))` being NULL per column).
    */
  def minhashSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) null
    else {
      val mins = Array.fill(A.length)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var k = 0
        while (k < A.length) {
          val v = (A(k) * h + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  def simhash24(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](24)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 24) {
        if (((h >> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 24) {
      if (2 * ones(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** All K minhash values of a hash array: min over (a_k*h + b_k) % P per
  * permutation. Returns NULL for an empty input — matching
  * `array_min(transform(empty))` being NULL per column in the symbolic
  * form.
  */
case class MinhashSigExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhashSig(input.asInstanceOf[ArrayData])

  /** nullSafeCodeGen (not defineCodeGen): the kernel itself returns null
    * on an empty array, so the generated code must fold that back into
    * the expression's isNull slot.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.SketchKernels.minhashSig($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 24-bit SimHash of a hash array: bit i set iff a strict majority of
  * elements have bit i set (empty input → 0, as in the symbolic form).
  */
case class Simhash24Expression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash24"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.simhash24(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.simhash24($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  def minhashSig(hs: Column): Column =
    SqlBridge.column(MinhashSigExpression(SqlBridge.expression(hs)))

  def simhash24(hs: Column): Column =
    SqlBridge.column(Simhash24Expression(SqlBridge.expression(hs)))
}
