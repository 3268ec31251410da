package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Governance, SequenceOps, ShuffleOps}

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("incremental aggregate maintenance equals the full recompute on every group") {
    val rows = Governance.incrementalAgg(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"${r.getString(0)}: incr != full")
      assert(r.getInt(4) == 1)
    }
  }

  test("KMV estimate is exact below k and within 4 sigma above it") {
    val rows = ShuffleOps.kmvDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      if (exact < ShuffleOps.KmvK) assert(est == exact)
      assert(r.getInt(3) == 1, s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("KMV sketch is merge-order independent: repartitioned input gives identical estimates") {
    // the aggregate merges partial heaps; any partitioning must converge
    // to the same k smallest hashes
    val a = ShuffleOps.kmvDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = ShuffleOps.kmvDistinct(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("streaming funnel equals the batch funnel stage counts") {
    val batch = SequenceOps.funnel(Tables.events(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stream = graft.streaming.StreamQueries.queries("q_stream_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stream == batch)
    assert(batch.values.forall(_ > 0))
  }
}
