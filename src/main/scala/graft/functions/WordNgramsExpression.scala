package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** tokenize → word n-gram strings, fused into one loop per document
  * (r19 optimization).
  *
  * The symbolic chain (split, then PortableSql.bigramsAll/trigramsAll —
  * a `transform` over `sequence(1, n-1)` with two/three `element_at`
  * lookups and string concats per index) runs interpreted per element
  * and walks ~10 boxed expression nodes per gram; it is the dominant
  * per-doc cost of the occurrence-level n-gram queries (phrase search,
  * hapax, bigram LM, PMI collocations). This kernel emits the IDENTICAL
  * array — all n-grams in position order, duplicates kept, empty below
  * n tokens, split on single space KEEPING empties (Spark's
  * `split(text, " ")` = `String.split(" ", -1)`) — so the DuckDB oracle
  * keeps evaluating the symbolic form. Same fused-kernel contract as
  * TrigramHashesExpression, which pins the split/guard semantics.
  */
object WordNgramsKernel {
  def compute(input: UTF8String, n: Int): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class WordNgramsExpression(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"word_${n}grams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramsKernel.compute(input.asInstanceOf[UTF8String], n)

  /** Codegen as a static kernel call (the JaroWinklerKernel precedent):
    * the r19 CodegenFallback form excluded the hosting Project from
    * whole-stage codegen, splitting the surrounding span into extra
    * generated classes and iterator boundaries — pure compile + per-row
    * overhead. The call text is constant across plans, so janino's
    * code cache shares one compiled class between every query that
    * projects this kernel.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramsKernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsExpression {
  /** All word bigrams of a TEXT column, in order, duplicates kept —
    * `PortableSql.bigramsAll(split(text, ' '))` as one fused loop.
    */
  def bigrams(text: Column): Column =
    SqlBridge.column(WordNgramsExpression(SqlBridge.expression(text), 2))

  /** All word trigrams — `PortableSql.trigramsAll` likewise. */
  def trigrams(text: Column): Column =
    SqlBridge.column(WordNgramsExpression(SqlBridge.expression(text), 3))
}
