package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel, reproducing the published algorithm
  * with the SAME operation order as DuckDB's implementation (verified
  * empirically against `jaro_winkler_similarity` on the classic vector
  * pairs — martha/marhta 0.9611..., dixon/dicksonx 0.8133... — and on a
  * below-threshold pair where the Winkler boost must NOT fire):
  *
  *   - match window = max(l1,l2)/2 - 1 (integer floor, min 0);
  *   - greedy leftmost matching, transpositions = mismatched matched
  *     positions / 2 (integer);
  *   - jaro = ((m/l1 + m/l2) + (m-t)/m) / 3  (left-associated);
  *   - Winkler boost ONLY when jaro > 0.7:
  *     jw = jaro + (prefix * 0.1) * (1 - jaro), prefix capped at 4;
  *   - either side empty -> 0.0 (both empty -> 1.0).
  *
  * Queries compare `floor(jw * 1e6)` across engines: every term above is
  * a division or product of small integers, so IEEE doubles agree
  * bit-for-bit when the operation order matches — the floor is belt and
  * braces, not a fudge factor.
  *
  * ASCII caveat (applies to DuckDB's `levenshtein` too): this kernel
  * walks UTF-16 code units while DuckDB walks UTF-8 bytes, so the two
  * only agree on ASCII inputs — one 'é' changes the length terms and
  * the match window on the DuckDB side. The oracle-compared vocabulary
  * (p_name) is ASCII; a non-ASCII corpus needs a byte-walking variant
  * of this kernel (trivial: operate on getBytes(UTF_8)).
  */
object JaroWinklerKernel {
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var k = 0
    var half = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val t = half / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      jaro + (prefix * 0.1) * (1.0 - jaro)
    }
  }

  /** O(l1+l2) SOUND upper-bound screen: false ONLY when
    * floor(similarity(s1,s2)*1e6) < microMin is GUARANTEED — the
    * lossless prefilter in front of the O(l1*window) kernel
    * (VERDICT r13 Next #5). Three sound over-estimates compose:
    *
    *   - m <= histogram intersection over a 32-bin char fold (greedy
    *     matching is injective on characters; bin collisions only RAISE
    *     the intersection — coarser stays sound);
    *   - (m - t)/m <= 1 (transpositions ignored);
    *   - the Winkler boost uses the EXACT common prefix (O(4)) at its
    *     maximal gating: jw <= jaroUB + 0.1*p*(1 - jaroUB), valid
    *     whether or not the true jaro clears the 0.7 gate because the
    *     bound is monotone in jaro and the boost is nonnegative.
    *
    * The comparison is exact integer cross-multiplication (no doubles):
    * with A = hi*l1 + hi*l2 + l1*l2 and B = 3*l1*l2, jaroUB = A/B and
    * jwUB*10B = 10A + p*(B - A). One micro-unit of slack absorbs the
    * kernel's IEEE rounding vs the rational bound: skip only when
    * jwUB*1e6 < microMin - 1.
    */
  def mayReachMicro(s1: String, s2: String, microMin: Long): Boolean = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1000000L >= microMin
    if (l1 == 0 || l2 == 0) return 0L >= microMin
    // OVERFLOW GUARD (ADVICE r14): the cross-multiplied comparison below
    // peaks at 14*b*1e6 = 42e6*l1*l2, which exceeds Long once l1*l2
    // ≳ 2.2e11 (strings ~500k chars). Past 2^37 ≈ 1.4e11 return true —
    // never skip — which is unconditionally sound and free.
    if (l1.toLong * l2 > (1L << 37)) return true
    val h = new Array[Int](32)
    var i = 0
    while (i < l1) { h(s1.charAt(i) & 31) += 1; i += 1 }
    var inter = 0
    i = 0
    while (i < l2) {
      val c = s2.charAt(i) & 31
      if (h(c) > 0) { h(c) -= 1; inter += 1 }
      i += 1
    }
    if (inter == 0) return 0L >= microMin
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    val a = inter.toLong * l1 + inter.toLong * l2 + l1.toLong * l2
    val b = 3L * l1 * l2
    (10L * a + p.toLong * (b - a)) * 1000000L >= (microMin - 1L) * 10L * b
  }
}

case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  /** Codegen as a static kernel call — the r8-era CodegenFallback broke
    * whole-stage codegen for every operator downstream of a JW column,
    * which was invisible on the 64-name fuzzy vocabulary but dominates
    * q_er_fs_score's ~1M-candidate scoring pass.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {
  def jaroWinkler(a: Column, b: Column): Column =
    SqlBridge.column(
      JaroWinklerExpression(SqlBridge.expression(a), SqlBridge.expression(b)))

  def jwMayReach(a: Column, b: Column, microMin: Long): Column =
    SqlBridge.column(JwMayReachExpression(
      SqlBridge.expression(a), SqlBridge.expression(b), microMin))
}

/** The [[JaroWinklerKernel.mayReachMicro]] screen as a codegen'd
  * predicate column — the cheap test a `when` guard evaluates BEFORE
  * deciding to invoke the quadratic kernel, keeping the whole
  * screen-then-score pattern inside one whole-stage-codegen span.
  */
case class JwMayReachExpression(left: Expression, right: Expression,
    microMin: Long) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "jw_may_reach"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.mayReachMicro(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString,
      microMin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.mayReachMicro(" +
        s"$a.toString(), $b.toString(), ${microMin}L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
