package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, EqualTo, Explode, Expression, GreaterThanOrEqual, IntegralDivide, LessThanOrEqual, Literal, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule — the (c) tier's `Rule[LogicalPlan]` leg (the engine
  * already ships the LogicalPlan + Strategy + SparkPlan leg as the native
  * as-of join): rewrites an inner BAND JOIN with no equi key,
  *
  *   points JOIN intervals ON p >= lo AND p <= lo + c      (LongType, c literal)
  *
  * which Spark can only plan as a nested-loop join (quadratic at 100 TB),
  * into the bucketed equi-join ShuffleOps.intervalJoinBucketed builds by
  * hand: both sides key on `value DIV (c+1)`, the interval side explodes
  * to the ≤ 2 buckets its span can touch, and the original band predicate
  * stays as a residual filter. The rewrite is semantics-preserving for
  * any data (truncating division is monotone, so a point's bucket always
  * lies in its matching interval's bucket range — negatives included; a
  * NULL bound matches nothing in either form) for spans up to
  * [[MaxSpan]] — wider literals fall through untouched, see the guard —
  * so firing is never wrong, only ever faster.
  *
  * Guards: inner join; the condition's conjuncts contain the band pair
  * over opposite sides and NO equi conjunct (an equi-keyed range join is
  * already a hash join — q_range_join's shape — and must be left alone).
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (idempotent, like AsofStrategy) and injectable through
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitAnd(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          sideOf(a, j).isDefined && sideOf(b, j).isDefined &&
            sideOf(a, j) != sideOf(b, j)
        case _ => false
      }
      if (hasEqui) j
      else matchBand(conjuncts, j) match {
        case Some((p, lo, c)) =>
          val width = Literal(c + 1L, LongType)
          val (pSide, iSide, flipped) =
            if (sideOf(p, j).contains(true)) (left, right, false)
            else (right, left, true)
          // points: one added bucket column
          val pAlias = Alias(IntegralDivide(p, width), "graft_p_bucket")()
          val pPlan = Project(pSide.output :+ pAlias, pSide)
          // intervals: explode to the 2 buckets the span CAN touch. With
          // width = c+1 the interval [lo, lo+c] spans at most two
          // buckets, and the upper one is always lo DIV w + 1 — so the
          // stop is computed WITHOUT ever forming lo + c, which for lo
          // near Long.MaxValue would throw under ANSI (where the
          // original plan evaluates the predicate lazily per pair) or
          // wrap under non-ANSI and hand Sequence a stop < start (step
          // defaults to -1 and materializes a ~2^63-element array). The
          // +1 itself cannot overflow: c >= 1 ⇒ w >= 2 ⇒ |lo DIV w| <=
          // Long.MaxValue/2. A spurious second bucket when the span
          // fits one bucket only adds candidates the residual filter
          // drops.
          val iAttr = AttributeReference("graft_i_bucket", LongType, nullable = false)()
          val loBucket = IntegralDivide(lo, width)
          // Sequence is TimeZoneAwareExpression: a post-analysis rule must
          // supply the zone itself or the plan re-validates as unresolved
          val gen = Explode(Sequence(
            loBucket, Add(loBucket, Literal(1L, LongType)), None,
            Some(conf.sessionLocalTimeZone)))
          val iPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(iAttr), child = iSide)
          val (jl, jr) = if (flipped) (iPlan, pPlan) else (pPlan, iPlan)
          val bucketJoin = Join(jl, jr, Inner,
            Some(EqualTo(pAlias.toAttribute, iAttr)), hint)
          Project(j.output, Filter(cond, bucketJoin))
        case None => j
      }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  /** Some(true) if `e` references only the left side, Some(false) only
    * the right, None if mixed/neither.
    */
  private def sideOf(e: Expression, j: Join): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(j.left.outputSet)) Some(true)
    else if (refs.subsetOf(j.right.outputSet)) Some(false)
    else None
  }

  /** Largest span the rewrite accepts — beyond this width = c+1 itself
    * approaches wrap-around, and a band that wide matches ~every pair
    * anyway, so fall through to the original plan instead of
    * "optimizing" it. The lower bound (c >= 1) keeps the exploded stop
    * bucket `lo DIV w + 1` overflow-free for ANY lo (w >= 2); a literal
    * c = 0 never reaches the matcher anyway — constant folding collapses
    * `lo + 0` to `lo` before the optimizer runs.
    */
  val MaxSpan: Long = Long.MaxValue / 4

  /** Find the band pair (p >= lo, p <= lo + c) over opposite sides with
    * LongType attributes and a positive long literal span within
    * [[MaxSpan]].
    */
  private def matchBand(conjuncts: Seq[Expression], j: Join)
      : Option[(Attribute, Attribute, Long)] = {
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p: Attribute, lo: Attribute)
          if bandSides(p, lo, j) => (p, lo)
      case LessThanOrEqual(lo: Attribute, p: Attribute)
          if bandSides(p, lo, j) => (p, lo)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p: Attribute, Add(lo: Attribute, Literal(c: Long, LongType), _))
          if bandSides(p, lo, j) && c >= 1 && c <= MaxSpan => (p, lo, c)
      case GreaterThanOrEqual(Add(lo: Attribute, Literal(c: Long, LongType), _), p: Attribute)
          if bandSides(p, lo, j) && c >= 1 && c <= MaxSpan => (p, lo, c)
    }
    (for {
      (p1, lo1) <- lowers
      (p2, lo2, c) <- uppers
      if p1.semanticEquals(p2) && lo1.semanticEquals(lo2)
    } yield (p1, lo1, c)).headOption
  }

  private def bandSides(p: Attribute, lo: Attribute, j: Join): Boolean =
    p.dataType == LongType && lo.dataType == LongType && {
      val (ps, los) = (sideOf(p, j), sideOf(lo, j))
      ps.isDefined && los.isDefined && ps != los
    }
}
