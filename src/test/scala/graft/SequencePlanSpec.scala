package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AuditOps, Governance, MiningOps, SequenceOps, StringSimOps}

/** Plan-shape + degenerate-input coverage for the sequence/audit/mining
  * operator families (the PlanShapeSpec / EmptyInputSpec discipline
  * applied to this round's additions): the property that matters at
  * 100 TB is the exchange count and join strategy, and a zero-row
  * partition-pruned input is an everyday plan.
  */
class SequencePlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def emptyEvents = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, Long, Double)]
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  private def emptyParts = {
    import spark.implicits._
    Seq.empty[(Long, String, String, Int, Double)]
      .toDF("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
  }

  test("attribution and twap plan exactly ONE hash exchange (window + agg reuse it)") {
    Seq(SequenceOps.attribution(Tables.events(spark, dir)),
        SequenceOps.twap(Tables.events(spark, dir))).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(n == 1, s"expected 1 exchange, got $n:\n$plan")
    }
  }

  test("fkIntegrity broadcasts every dimension (7 broadcast outer probes, no shuffle joins)") {
    val plan = AuditOps.fkIntegrity(spark, dir).queryExecution.executedPlan.toString
    val outer = "BroadcastHashJoin .*LeftOuter".r.findAllIn(plan).length
    assert(outer == 7, s"expected 7 broadcast left-outer joins, got $outer:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no FK edge may shuffle the fact side:\n$plan")
  }

  test("skyline never plans a nested-loop or cartesian dominance join") {
    val plan = AuditOps.skyline(Tables.part(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the bucket two-pass: the ONLY single-partition exchange feeds the
    // bucket-frame window; the per-price window is partitioned by bucket
    val single = "SinglePartition".r.findAllIn(plan).length
    assert(single == 1, s"expected exactly the bucket window's exchange, got $single:\n$plan")
  }

  test("equi-depth histogram and conversion lag plan no unpartitioned window") {
    // the named scale-killer class: a Window whose partitionSpec is empty
    // funnels the whole frame through one partition
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] =
      SparkTestBase.collectInPlan(p) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    Seq(Governance.histogramEquiDepth(spark, dir),
        SequenceOps.conversionLag(Tables.events(spark, dir))).foreach { df =>
      val ws = windows(df.queryExecution.executedPlan)
      assert(ws.nonEmpty, "expected the per-bucket rank window in the plan")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in plan:\n$w"))
    }
  }

  test("hopping windows emit every event into exactly size/slide windows") {
    val events = Tables.events(spark, dir)
    val total = SequenceOps.hoppingRevenue(events)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val k = SequenceOps.HopSizeMs / SequenceOps.HopSlideMs
    assert(total == k * events.count(), s"expected ${k}x coverage")
    val starts = SequenceOps.hoppingRevenue(events)
      .select("start_ms").collect().map(_.getLong(0))
    assert(starts.forall(_ % SequenceOps.HopSlideMs == 0), "unaligned window start")
  }

  test("sequence/audit operators survive an empty input") {
    val e = emptyEvents
    assert(SequenceOps.funnel(e).collect().forall(_.getLong(1) == 0L))
    assert(SequenceOps.cohortRetention(e).count() == 0)
    assert(SequenceOps.transitions(e).count() == 0)
    assert(SequenceOps.twap(e).count() == 0)
    assert(SequenceOps.attribution(e).count() == 0)
    assert(SequenceOps.eventPaths(e).count() == 0)
    // empty corpus: every aggregate is NULL (identically in the oracle)
    val lag = SequenceOps.conversionLag(e).collect()(0)
    assert(lag.isNullAt(0) && lag.isNullAt(1) && lag.isNullAt(2))
    assert(AuditOps.anomalyZscore(e).count() == 0)
    assert(AuditOps.skyline(emptyParts).count() == 0)
    assert(StringSimOps.levPairs(emptyParts).count() == 0)
    assert(StringSimOps.jwPairs(emptyParts).count() == 0)
    assert(MiningOps.rfmSegments(
      spark.emptyDataFrame.select(lit(1L).as("o_custkey"),
        lit("2024-01-01").as("o_orderdate"), lit(0.0).as("o_totalprice"))
        .limit(0)).count() == 0)
  }
}
