package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, SampleOps}

/** Physical-plan shape assertions for the round-4 operators — the
  * property that matters at 100 TB is the PLAN, not the sf0.001 result:
  *
  *   - the as-of join must stay the one-shuffle union+window plan (a
  *     range-join rewrite would explode quadratically in history);
  *   - the uniform sample must plan as TakeOrderedAndProject
  *     (per-partition top-k + k-row driver merge), never a full sort.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("asofJoin plans ONE hash-partition exchange on the key, no join node") {
    val plan = AsofJoin.purchaseAsofClick(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 key exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must be windowed, not a join rewrite:\n$plan")
  }

  test("uniform sample plans TakeOrderedAndProject, not a global sort") {
    val plan = SampleOps.uniformSample(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sample must not range-shuffle the corpus:\n$plan")
  }

  test("stratified sample shuffles once on the stratum key") {
    val plan = SampleOps.stratifiedByLang(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 stratum exchange:\n$plan")
  }
}
