package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShuffleOps

/** The bucketed join must be shuffle-free (that is its whole point) and
  * the salted two-phase aggregate must merge exactly.
  */
class ShuffleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans with NO exchange") {
    ShuffleOps.bucketedSegmentRevenue(spark, dir).collect() // writes tables
    val plan = ShuffleOps.bucketedJoinPlan(spark)
      .queryExecution.executedPlan.toString
    // the join itself reads co-located buckets; the only exchange allowed
    // is the one for the final small group-by
    val joinPart = plan.split("HashAggregate").last // below the agg: join + scans
    assert(joinPart.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!joinPart.contains("Exchange"), s"join subtree must be exchange-free:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"expected bucket pruning info:\n$plan")
  }

  test("bloom prune filters the fact side BELOW the join") {
    import org.apache.spark.sql.functions.col
    val q = ShuffleOps.bloomPrunedJoin(spark, dir)
    val plan = q.queryExecution.optimizedPlan.toString
    // the might_contain filter must sit on the lineitem branch (below the
    // join), so the pruned rows never reach the join shuffle
    val joinIdx = plan.indexOf("Join")
    val bloomIdx = plan.indexOf("might_contain")
    assert(bloomIdx >= 0, s"bloom filter vanished from the plan:\n$plan")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"might_contain must be under the join, not above it:\n$plan")
    // and the result is the exact join's (false positives die in the join)
    val exact = graft.Tables.lineitem(spark, dir)
      .join(graft.Tables.part(spark, dir).filter(col("p_size") === 1),
        col("l_partkey") === col("p_partkey"))
      .count()
    assert(q.agg(org.apache.spark.sql.functions.sum(col("n_items"))).collect()(0).getLong(0) == exact)
  }

  test("AQE splits the skewed join partitions at runtime (skew=true in final plan)") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      val df = ShuffleOps.aqeSkewJoinPlan(spark, dir)
      val rows = df.collect()
      // 3 tiers out; every order lands in exactly one
      assert(rows.length == 3)
      assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, dir).count())
      // the FINAL adaptive plan must carry the runtime skew split on the
      // shuffled join — the whole point of the row
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("salted aggregate equals the direct group-by") {
    import spark.implicits._
    val salted = ShuffleOps.saltedStatusRevenue(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val direct = Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"o_totalprice"
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(salted.sameElements(direct))
  }
}
