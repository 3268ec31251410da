package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join as a first-class engine operator — the (c) tier of
  * the custom-operator ladder: a logical node, a planner Strategy, and a
  * physical `SparkPlan`, registered per-session via
  * `spark.experimental.extraStrategies` (and injectable through
  * `SparkSessionExtensions.injectPlannerStrategy`).
  *
  * Semantics: for every left row, the LAST right row of the same key
  * with `rightTime <= leftTime` (ties between equal (key, time) right
  * rows broken by `rightOrder` ascending, last wins) — exactly
  * `AsofJoin.asofJoin`'s union+window plan, which stays the oracle.
  *
  * Why a physical operator when the union+window plan already scales:
  * the window plan materializes the UNION of both inputs through one
  * sort, so every probe row carries null-padded right columns through
  * the shuffle and the sort runs over |L|+|R| rows with the full padded
  * width. This exec asks the planner for co-partitioned, per-side
  * sorted children (each side sorts only its OWN columns) and then
  * streams a single forward merge per partition with O(1) state — the
  * textbook merge-join shape, with the matched right row carried
  * atomically (null attributes of a matched row stay null; they never
  * backfill from an older row).
  *
  * Keys and times are LongType by contract (ids and epoch micros — the
  * engine's as-of surface); the merge compares primitives, no ordering
  * objects in the inner loop.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightOrder: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoinPlan -> AsofJoinExec. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, ro) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ro) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightOrder: Expression) extends BinaryExecNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType,
    "asof native operator requires LongType keys and times")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides on the key; EnsureRequirements inserts the
    * (single) hash exchange per side and aligns partition counts.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Each side sorted by (key, time[, order]) — the planner adds local
    * sorts only (no global ordering ever exists).
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightOrder, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.size
    val outAttrs = output
    // bind against nullability-WIDENED right attributes: an unmatched
    // probe joins the all-null row, and a projection bound to the
    // child's non-nullable attrs would elide the null checks and read
    // zeros instead of nulls
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val rBuf = rIter.buffered
      // the last qualifying right row and its key: O(1) state per task
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null
      lIter.map { lrow =>
        val lkAny = lKeyB.eval(lrow)
        val ltAny = lTimeB.eval(lrow)
        // SQL null semantics: a NULL key or time compares unknown, so a
        // null left row matches nothing. Nulls sort FIRST, so they
        // precede every real key — emitting without advancing keeps the
        // merge cursor aligned. (Unboxing a null to 0L instead would
        // both fabricate key-0 matches and stall the merge for
        // negative keys.)
        if (lkAny == null || ltAny == null) proj(joined(lrow, nullRight))
        else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val peek = rBuf.head
            val rkAny = rKeyB.eval(peek)
            val rtAny = if (rkAny == null) null else rTimeB.eval(peek)
            if (rkAny == null || rtAny == null) {
              // null right keys/times never qualify; consume and drop
              // (they sort before all real rows of their key)
              rBuf.next(); ()
            } else {
              val rk = rkAny.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rtAny.asInstanceOf[Long] <= lt)) {
                val r = rBuf.next()
                if (rk == lk) {
                  matchKey = rk; hasMatch = true
                  matchRow = r.copy() // sort iterators reuse row objects
                }
              } else advance = false
            }
          }
          val m = if (hasMatch && matchKey == lk) matchRow else nullRight
          proj(joined(lrow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNative {

  /** Install the planner strategy on `spark` (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    ()
  }

  /** As-of join `left` to `right` (columns must not collide — rename the
    * right side first, as with AsofJoin.asofJoin).
    */
  def asof(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightOrder: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    SqlBridge.ofRows(spark, AsofJoinPlan(lp, rp,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime), attr(right, rightOrder)))
  }
}
