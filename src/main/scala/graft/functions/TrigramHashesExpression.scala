package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** tokenize → word-trigram shingle → dedup → strHash, fused into ONE loop
  * per document.
  *
  * The symbolic chain (PortableSql.trigramShingles over a bound token
  * array, then StrHashArrayExpression) pays three interpreted
  * higher-order passes plus a gram-string array materialization per doc —
  * ~25-30 CPU-seconds over the sf0.1 corpus, the dominant cost of every
  * shingle-based dedup query even after the join shapes were fixed. This
  * kernel produces the identical output (hashes of DISTINCT trigrams in
  * first-occurrence order; empty array below 3 tokens) so the DuckDB
  * oracle keeps evaluating the symbolic form:
  *
  *   - tokens = split on single space KEEPING empties (Spark's
  *     `split(text, " ")` = `String.split(" ", -1)`);
  *   - gram dedup is on the gram STRING (array_distinct(grams)), not the
  *     hash, preserving first-occurrence order;
  *   - hash = base-127 polynomial over the first 16 chars salted with
  *     length, mod 1e9+7 (ASCII corpus: `ascii(substr(w,i,1))` ==
  *     `charAt(i-1)`), exactly StrHashKernel's loop.
  *
  * All four kernels here codegen as static calls (the JaroWinklerKernel
  * precedent) so the hosting Project stays inside its whole-stage span —
  * the r19 CodegenFallback forms split the span into extra generated
  * classes per query.
  */
object TrigramHashesKernel {
  def distinctHashes(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 3) new GenericArrayData(Array.emptyLongArray)
    else {
      val seen = mutable.HashSet.empty[String]
      val out = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i <= toks.length - 3) {
        val gram = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        if (seen.add(gram)) out += StrHashKernel.hash(gram)
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def allHashes(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 3) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](toks.length - 2)
      var i = 0
      while (i <= toks.length - 3) {
        out(i) = StrHashKernel.hash(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def rollingFp(input: UTF8String): Long = {
    val toks = input.toString.split(" ", -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = (acc * 31 + StrHashKernel.hash(toks(i))) % StrHashKernel.P
      i += 1
    }
    acc
  }

  def bigramTop(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 2) new GenericArrayData(Array(0L, 0L))
    else {
      val counts = mutable.HashMap.empty[String, Long]
      var top = 0L
      var i = 0
      while (i < toks.length - 1) {
        val gram = toks(i) + " " + toks(i + 1)
        val c = counts.getOrElse(gram, 0L) + 1L
        counts.update(gram, c)
        if (c > top) top = c
        i += 1
      }
      new GenericArrayData(Array((toks.length - 1).toLong, top))
    }
  }
}

case class TrigramHashesExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TrigramHashesKernel.distinctHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramHashesKernel.distinctHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramHashesExpression {
  def trigramHashes(text: Column): Column =
    SqlBridge.column(TrigramHashesExpression(SqlBridge.expression(text)))

  def trigramHashesAll(text: Column): Column =
    SqlBridge.column(TrigramHashesAllExpression(SqlBridge.expression(text)))
}

/** [[TrigramHashesExpression]] minus the dedup: hashes of ALL word-trigram
  * shingles in position order, duplicates kept — the occurrence-level view
  * that repeated-span statistics need (a doc that repeats one paragraph
  * twice must count those shingles twice). Oracle form is
  * PortableSql.trigramsAll + strHash, no distinct.
  */
case class TrigramHashesAllExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hashes_all"

  override protected def nullSafeEval(input: Any): Any =
    TrigramHashesKernel.allHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramHashesKernel.allHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-sensitive rolling fingerprint over ALL word tokens (dup tokens
  * included): fold of `(acc * 31 + strHash(token)) % P` in token order —
  * the fused form of `reduceLong(tokenHashes(text), ...)` whose
  * interpreted lambda chain was q_text_fingerprint's per-doc cost. Same
  * split-keeping-empties tokenization and strHash arithmetic as
  * [[TrigramHashesExpression]]; the DuckDB oracle keeps the symbolic
  * list_reduce form.
  */
case class RollingFpExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(input: Any): Any =
    TrigramHashesKernel.rollingFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramHashesKernel.rollingFp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFpExpression {
  def rollingFp(text: Column): Column =
    SqlBridge.column(RollingFpExpression(SqlBridge.expression(text)))
}

/** Bigram repetition statistics fused into one pass: [n_bigrams,
  * top_bigram_count] per document (empty text / <2 tokens → [0, 0]).
  * The symbolic form — interpreted HOF bigram build, explode, two
  * doc-keyed groupBys — was the most expensive text query at sf0.1
  * (5.3s); one hash-map loop per doc replaces all of it, and the
  * DuckDB oracle keeps the symbolic unnest/GROUP BY form. Same
  * split-keeping-empties tokenization as the other kernels; counts are
  * exact, so the outputs are engine-identical.
  */
case class BigramTopExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_top"

  override protected def nullSafeEval(input: Any): Any =
    TrigramHashesKernel.bigramTop(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramHashesKernel.bigramTop($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramTopExpression {
  def bigramTop(text: Column): Column =
    SqlBridge.column(BigramTopExpression(SqlBridge.expression(text)))
}
