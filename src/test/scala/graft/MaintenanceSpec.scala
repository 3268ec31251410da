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

  test("winsorized sums match a driver-side exact recomputation") {
    val rows = Governance.winsorized(spark, dir).collect()
    assert(rows.nonEmpty)
    val raw = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), expr("CAST(round(o_totalprice*100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val cents = raw(r.getString(0))
      val n = cents.length
      val lo = cents((5 * n + 99) / 100 - 1)
      val hi = cents((95 * n + 99) / 100 - 1)
      assert(r.getLong(2) == lo && r.getLong(3) == hi, s"${r.getString(0)} cuts")
      assert(r.getLong(4) == cents.count(_ < lo).toLong)
      assert(r.getLong(5) == cents.count(_ > hi).toLong)
      assert(r.getLong(6) == cents.map(c => math.max(lo, math.min(hi, c))).sum)
    }
  }

  test("equi-depth histogram buckets are balanced and ordered") {
    val rows = Governance.histogramEquiDepth(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 10)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10) <= 1, s"unbalanced: $r")
      assert(r.getLong(2) <= r.getLong(3))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2), s"overlapping buckets: $a / $b")
    }
  }

  test("shard plan covers every doc with contiguous, size-bounded shards") {
    val docs = Tables.documents(spark, dir)
    val shards = graft.operators.SampleOps.shardPlan(docs).collect()
      .sortBy(_.getLong(0))
    assert(shards.map(_.getLong(1)).sum == docs.count())
    assert(shards.map(_.getLong(0)).toSeq == (0L until shards.length).toSeq,
      "shard ids must be contiguous from 0")
    val maxDoc = docs.agg(max("n_chars")).collect()(0).getLong(0)
    val target = graft.operators.SampleOps.ShardChars
    shards.foreach { r =>
      assert(r.getLong(2) < target + maxDoc, s"oversized shard: $r")
    }
    // every shard except the last is filled to at least the target
    shards.dropRight(1).foreach { r =>
      assert(r.getLong(2) >= target - maxDoc, s"underfilled shard: $r")
    }
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
