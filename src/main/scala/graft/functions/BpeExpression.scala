package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** True BPE merge pass over a checked-in merge table (round-3 ask #10 —
  * the upgrade over the regex pre-tokenizer alone, which only BOUNDS the
  * token count).
  *
  * Semantics (the contract both the kernel and the DuckDB oracle
  * implement): pre-tokenize the document with the same regex as
  * TextOps.bpeTokenCounts (letter runs / digit runs / single marks); per
  * word, start from the character sequence and apply each merge rule in
  * table order as ONE left-to-right greedy fold — a symbol is merged with
  * its left neighbour when the pair matches the rule, and a symbol
  * produced by a merge participates immediately as the new left
  * neighbour. For a well-formed table (every rule's parts are base
  * characters or products of EARLIER rules) this sequential pass order
  * equals the rank-priority BPE inference loop, because a merge can only
  * create new pairs involving the merged symbol itself.
  *
  * The table is a deliberately small, checked-in stand-in for a trained
  * vocabulary (the container has none — VERDICT r2/r3); the merge
  * MACHINERY is the real thing and is what the oracle pins.
  */
object BpeMerges {

  /** 50 merge rules (pair → concatenation), English-digram flavored.
    * Chained rules ("f"+"or", "in"+"g", "the"+"r") appear after the rules
    * that produce their parts.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"),
    ("i", "t"), ("i", "s"), ("t", "o"), ("o", "f"), ("e", "d"),
    ("a", "l"), ("s", "e"), ("n", "t"), ("l", "e"), ("d", "e"),
    ("c", "o"), ("r", "o"), ("i", "c"), ("l", "i"), ("h", "a"),
    ("m", "e"), ("b", "e"), ("m", "a"), ("s", "i"), ("p", "r"),
    ("t", "i"), ("w", "a"), ("f", "or"), ("in", "g"), ("i", "o"),
    ("io", "n"), ("e", "a"), ("w", "h"), ("v", "e"), ("n", "o"),
    ("u", "s"), ("l", "o"), ("u", "t"), ("g", "h"), ("the", "r"))

  /** One greedy left-to-right merge pass of a single rule. */
  private[functions] def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Token count of one pre-token after all merge passes. Base symbols
    * are CODEPOINTS, not UTF-16 code units — the oracle's
    * `regexp_extract_all(w, '.')` yields one symbol per codepoint, so a
    * supplementary-plane char (emoji) must be ONE base symbol here too,
    * not its two surrogate halves.
    */
  private[graft] def mergedLen(word: String): Int =
    mergedLenN(word, Merges.length)

  /** [[mergedLen]] restricted to the first `n` merge rules — the
    * vocab-size sweep entry point.
    */
  private[graft] def mergedLenN(word: String, n: Int): Int = {
    val out = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val cw = Character.charCount(cp)
      out += word.substring(i, i + cw)
      i += cw
    }
    var syms = out.toArray
    Merges.take(n).foreach { case (a, b) => syms = mergePass(syms, a, b) }
    syms.length
  }

  /** The DuckDB oracle form: per word, `Merges.length` chained fold
    * layers. Each layer is a `list_reduce` whose accumulator is the
    * space-joined merged prefix — "last symbol == a" is the suffix test
    * `right(acc, |a|+1) = ' a'` (symbols never contain spaces), and a
    * merge replaces that suffix with the concatenation. `list_reduce`
    * seeds with the first element, which equals the fold's step('', x0);
    * a single-char word skips the lambda and returns the char.
    */
  def oracleTokenCount(wordVar: String): String =
    oracleTokenCountN(wordVar, Merges.length)

  /** [[oracleTokenCount]] over the first `n` rules only. */
  def oracleTokenCountN(wordVar: String, n: Int): String = {
    val chars = s"regexp_extract_all($wordVar, '.')"
    val folded = Merges.take(n).foldLeft(chars) { case (prev, (a, b)) =>
      val m = a + b
      val step =
        s"CASE WHEN x = '$b' AND (acc = '$a' OR right(acc, ${a.length + 1}) = ' $a') " +
          s"THEN substr(acc, 1, length(acc) - ${a.length}) || '$m' " +
          s"ELSE acc || ' ' || x END"
      s"string_split(list_reduce($prev, (acc, x) -> $step), ' ')"
    }
    s"len($folded)"
  }
}

/** n_bpe_tokens of a document: pre-tokenize, then per-word BPE merges,
  * summed. One tight loop per row instead of 50 interpreted higher-order
  * folds per word; codegen is a static kernel call (the JaroWinklerKernel
  * precedent) so the hosting Project stays inside its whole-stage span.
  */
object BpeKernel {
  // same pre-tokenizer as TextOps.bpeTokenCounts / the oracle
  // (Pattern is immutable/thread-safe; matchers are per-call)
  private val pre =
    java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")

  def tokenCount(input: UTF8String, nMerges: Int): Long = {
    val m = pre.matcher(input.toString)
    var total = 0L
    while (m.find()) total += BpeMerges.mergedLenN(m.group(), nMerges)
    total
  }
}

case class BpeTokenCountExpression(child: Expression,
    nMerges: Int = BpeMerges.Merges.length)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.tokenCount(input.asInstanceOf[UTF8String], nMerges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.tokenCount($c, $nMerges)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  def bpeTokenCount(text: Column): Column =
    SqlBridge.column(BpeTokenCountExpression(SqlBridge.expression(text)))

  def bpeTokenCountN(text: Column, nMerges: Int): Column =
    SqlBridge.column(BpeTokenCountExpression(SqlBridge.expression(text), nMerges))
}
