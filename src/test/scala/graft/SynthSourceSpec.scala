package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SynthDataSource, SynthScanBuilder}

/** The DSv2 connector's three load-bearing claims, each pinned where it
  * is observable:
  *   - filter pushdown tightens the GENERATION ranges (unit-level on the
  *     ScanBuilder: pushed id predicates shrink the planned partitions);
  *   - column pruning reaches the physical scan (the executed plan's
  *     scan output must not mention the wide payload column);
  *   - the generated content equals the ladder arithmetic (row-level
  *     spot equality; the registry row q_dsv2_source carries the
  *     corpus-level DuckDB hash check).
  */
class SynthSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def table = spark.read.format("graft.sources.SynthDataSource")
    .option("rows", "10000").option("slices", "8").load()

  test("id-range filters push into the scan and shrink planned partitions") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val b = new SynthScanBuilder(10000L, 8)
    val rejected = b.pushFilters(Array(
      GreaterThanOrEqual("id", 2000L), LessThan("id", 3000L)))
    assert(rejected.isEmpty, "id range predicates must be fully absorbed")
    val parts = b.build().asInstanceOf[graft.sources.SynthScan].planInputPartitions()
    val covered = parts.map(_.asInstanceOf[graft.sources.SynthPartition])
    assert(covered.map(p => p.until - p.from).sum == 1000L,
      s"pushed range must plan exactly 1000 ids: ${covered.mkString(",")}")
    assert(covered.forall(p => p.from >= 2000L && p.until <= 3000L))
    // and end-to-end: the filtered count equals the range width with the
    // filter absorbed (no rows generated outside it to discard)
    assert(table.filter(col("id") >= 2000L && col("id") < 3000L).count() == 1000L)
  }

  test("unreferenced payload column is pruned out of the physical scan") {
    val df = table.select(col("channel"), col("amount_cents"))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.nonEmpty, "expected a BatchScan node")
    assert(!scanLine.contains("payload"),
      s"payload must be pruned from the scan output:\n$scanLine")
    assert(scanLine.contains("channel") && scanLine.contains("amount_cents"))
  }

  test("generated cells equal the shared ladder arithmetic") {
    val rows = table.filter(col("id") < 100L)
      .select(col("id"), col("channel"), col("amount_cents"))
      .collect()
    assert(rows.length == 100)
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getString(1) == SynthDataSource.channel(id))
      assert(r.getLong(2) == SynthDataSource.amountCents(id))
    }
  }

  test("count(*) scan (empty required schema) and empty pushed range survive") {
    assert(table.count() == 10000L)
    assert(table.filter(col("id") >= 10000L).count() == 0L)
  }

  test("MicroBatchStream drains under AvailableNow in admission-controlled batches") {
    import org.apache.spark.sql.DataFrame
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream.format("graft.sources.SynthDataSource")
      .option("rows", "10000").option("slices", "4")
      .option("rowsPerBatch", "3000").load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.incrementAndGet()
        total.addAndGet(df.count())
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 10000 ids at 3000/batch = 4 real micro-batches, no row lost or doubled
    assert(batches.get() == 4, s"expected 4 admission-controlled batches, got ${batches.get()}")
    assert(total.get() == 10000L, s"rows across batches: ${total.get()}")
  }

  test("aggregate pushdown folds the rollup inside the source readers") {
    val df = table
      .filter(col("id") >= 2000L && col("id") < 9000L)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("cents"),
        min(col("amount_cents")).as("lo"), max(col("amount_cents")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("SynthAggScan")).getOrElse("")
    assert(scanLine.nonEmpty,
      s"expected the SynthAggScan (pushed-aggregate) scan, got:\n$plan")
    assert(scanLine.contains("agg=[count,sum,min,max]") &&
      scanLine.contains("groupBy=channel") &&
      scanLine.contains("range=[2000, 9000)"),
      s"pushed agg + filter must both reach the scan:\n$scanLine")
    // the scan emits ≤ slices × |channels| partial cells, never data rows
    val partialRows = new graft.sources.SynthAggScan(
      null, 2000L, 9000L, 8, grouped = true, Seq("count"))
      .planInputPartitions()
      .map(p => new graft.sources.SynthAggReader(
        p.asInstanceOf[graft.sources.SynthPartition].from,
        p.asInstanceOf[graft.sources.SynthPartition].until,
        grouped = true, Seq("count")))
      .map { r => var n = 0; while (r.next()) n += 1; n }.sum
    assert(partialRows <= 8 * 5, s"partial cells out of the scan: $partialRows")
    // and the merged result equals the row-scan recompute
    val viaRows = table
      .filter(col("id") >= 2000L && col("id") < 9000L)
      .select(col("channel"), col("amount_cents"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_.getLong(1)).sum,
        rs.map(_.getLong(1)).min, rs.map(_.getLong(1)).max)).toMap
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == viaRows, s"pushed-agg result diverged:\n$got\nvs\n$viaRows")
  }

  test("global (ungrouped) aggregate pushes down too") {
    val df = table.agg(count(lit(1)).as("n"), max(col("amount_cents")).as("hi"))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthAggScan")).getOrElse("")
    assert(scanLine.contains("groupBy=<global>"), s"expected global pushed agg:\n$scanLine")
    val r = df.collect().head
    assert(r.getLong(0) == 10000L && r.getLong(1) ==
      (0L until 10000L).map(SynthDataSource.amountCents).max)
  }

  test("limit pushdown truncates the generated range instead of discarding") {
    val df = table.filter(col("id") >= 1000L).limit(500)
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthScan")).getOrElse("")
    assert(scanLine.contains("range=[1000, 1500)"),
      s"pushed limit must tighten the scan range:\n$scanLine")
    // deterministic: the first 500 surviving ids exactly
    assert(df.select(sum(col("id"))).collect().head.getLong(0) ==
      (1000L until 1500L).sum)
  }

  test("limit is refused when a residual post-scan filter exists") {
    // channel predicates can't push into the id-range generator, so the
    // first n GENERATED rows ≠ first n SURVIVING rows — the builder must
    // keep the full range and let Spark limit after the residual filter
    val df = table.filter(col("channel") === "web").limit(50)
    assert(df.count() == 50L)
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthScan")).getOrElse("")
    assert(scanLine.contains("range=[0, 10000)"),
      s"residual filter must block limit pushdown:\n$scanLine")
  }

  test("top-N on id ascending pushes as an early stop; other sorts are refused") {
    val df = table.orderBy(col("id")).limit(300)
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthScan")).getOrElse("")
    assert(scanLine.contains("range=[0, 300)"),
      s"id-asc top-N must tighten the scan range:\n$scanLine")
    assert(df.collect().map(_.getLong(0)).toSeq == (0L until 300L),
      "pushed top-N must still return the globally first 300 ids in order")
    // descending (or non-id) sorts can't early-stop an ascending
    // generator: the full range must survive
    val desc = table.orderBy(col("id").desc).limit(10)
    val descLine = desc.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthScan")).getOrElse("")
    assert(descLine.contains("range=[0, 10000)"),
      s"desc sort must refuse the top-N pushdown:\n$descLine")
    assert(desc.collect().map(_.getLong(0)).toSeq == (9999L to 9990L by -1L))
  }

  test("reported statistics drive broadcast-side planning for filtered reads") {
    import SparkTestBase.collectInPlan
    // a tightly-filtered read reports ~200 rows — the planner must pick
    // it as a BroadcastHashJoin build side against a bigger frame
    val small = table.filter(col("id") >= 100L && col("id") < 300L)
      .select(col("id"), col("amount_cents"))
    val big = spark.range(0, 50000L).select(col("id"))
    val joined = big.join(small, "id")
    val bhj = collectInPlan(joined.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"stats-reported small scan must broadcast:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 200L)
  }

  test("key-grouped partitioning plans the bucket rollup with no exchange") {
    import SparkTestBase.collectInPlan
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // the sum-of-expression keeps the aggregation SPARK-SIDE (not
    // pushed), so this pins the key-grouped NORMAL scan path
    val df = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "60000").option("bucketWidth", "2000").load()
      .filter(col("id") >= 4500L && col("id") < 51500L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("amount_cents") * 2L).as("cents2"))
    val rows = df.collect()
    // the EXECUTED plan (post-AQE) must contain zero exchanges: the
    // partial and final aggregate both run inside the scan's own
    // key-grouped partitions
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("SynthScan"),
      s"expression aggregate must stay on the NORMAL scan:\n$plan")
    val exchanges = collectInPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"bucket rollup must plan exchange-free:\n$plan")
    // un-aligned range: clipped edge buckets still count exactly
    assert(rows.length == 24)
    assert(rows.map(_.getLong(1)).sum == 47000L)
    val byBucket = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket(2L) == 1500L && byBucket(25L) == 1500L, // clipped edges
      s"edge buckets must clip to the pushed range: $byBucket")
    assert(byBucket(3L) == 2000L)
  }

  test("per-bucket aggregate pushes into the readers AND merges exchange-free") {
    import SparkTestBase.collectInPlan
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "60000").option("bucketWidth", "2000").load()
      .filter(col("id") >= 4500L && col("id") < 51500L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("cents"),
        min(col("amount_cents")).as("lo"), max(col("amount_cents")).as("hi"))
    val rows = df.collect()
    assert(rows.length == 24 && rows.map(_.getLong(1)).sum == 47000L)
    val plan = df.queryExecution.executedPlan
    val scanLine = plan.toString.linesIterator
      .find(_.contains("SynthAggScan")).getOrElse("")
    assert(scanLine.contains("groupBy=bucket"),
      s"per-bucket agg must push into the scan:\n$plan")
    // the residual merge exchange is CONSTANT-SIZE: the scan emitted one
    // row per bucket, so at most |buckets| rows cross it regardless of
    // data volume (Spark's pushed-agg rewrite aliases the group column,
    // which defeats alias-propagation of KeyGroupedPartitioning — the
    // non-pushed path above is the fully exchange-free variant)
    assert(collectInPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.size <= 1, s"pushed per-bucket rollup grew extra exchanges:\n$plan")
    // the scan emits exactly ONE cell per bucket partition
    val cells = new graft.sources.SynthAggScan(
      null, 4500L, 51500L, 8, grouped = false, Seq("count"), bucketWidth = 2000L)
      .planInputPartitions()
      .map(p => new graft.sources.SynthAggReader(
        p.asInstanceOf[graft.sources.SynthBucketPartition].from,
        p.asInstanceOf[graft.sources.SynthBucketPartition].until,
        grouped = false, Seq("count"),
        p.asInstanceOf[graft.sources.SynthBucketPartition].bucket))
      .map { r => var n = 0; while (r.next()) n += 1; n }
    assert(cells.length == 24 && cells.forall(_ == 1),
      s"one cell per bucket partition expected: ${cells.mkString(",")}")
    // spot check one interior bucket against the ladder
    val b3 = rows.find(_.getLong(0) == 3L).get
    val ids = (6000L until 8000L).map(SynthDataSource.amountCents)
    assert(b3.getLong(1) == 2000L && b3.getLong(2) == ids.sum &&
      b3.getLong(3) == ids.min && b3.getLong(4) == ids.max)
  }

  test("bucketWidth sizing: task-sized buckets, count grows with the domain") {
    import SynthDataSource.bucketWidthForDomain
    // width is the rows-per-task budget, clamped to the domain
    assert(bucketWidthForDomain(2000000L) == 62500L)
    assert(bucketWidthForDomain(1000L) == 1000L) // tiny domain: one bucket
    assert(bucketWidthForDomain(0L) == 1L)
    // the scale property: 100x the domain = 100x the buckets (tasks),
    // NOT 100x the per-task work
    val w = bucketWidthForDomain(2000000L)
    assert(200000000L / bucketWidthForDomain(200000000L) == 100L * (2000000L / w))
  }

  test("bucket-aligned partitions each hold exactly one partition-key value") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val b = new SynthScanBuilder(60000L, 8, bucketWidth = 2000L)
    b.pushFilters(Array(GreaterThanOrEqual("id", 4500L), LessThan("id", 51500L)))
    val scan = b.build().asInstanceOf[graft.sources.SynthScan]
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.SynthBucketPartition])
    assert(parts.length == 24) // buckets 2..25
    parts.foreach { p =>
      assert(p.from / 2000L == p.bucket && (p.until - 1L) / 2000L == p.bucket,
        s"partition $p spans more than one bucket")
      assert(p.partitionKey().getLong(0) == p.bucket)
    }
    assert(parts.map(p => p.until - p.from).sum == 47000L)
    // and the scan reports the matching key-grouped partitioning
    val kg = scan.outputPartitioning()
      .asInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
    assert(kg.numPartitions() == 24)
    assert(kg.keys().head.describe().contains("bucket"))
  }

  test("reported ordering removes both sort and exchange under a bucket window") {
    import SparkTestBase.collectInPlan
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "60000").option("bucketWidth", "2000").load()
      .filter(col("id") >= 4500L && col("id") < 51500L)
      .select(col("bucket"), col("id"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("bucket")).orderBy(col("id"))))
      .filter(col("rn") <= 3)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectInPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, s"window over the partition key must not exchange:\n$plan")
    assert(collectInPlan(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, s"reported (bucket, id) ordering must remove the sort:\n$plan")
    // top-3 ids per bucket, clipped first bucket starts at 4500
    assert(rows.length == 24 * 3)
    val b2 = rows.filter(_.getLong(0) == 2L).map(_.getLong(1)).sorted
    assert(b2.toSeq == Seq(4500L, 4501L, 4502L))
  }

  test("storage-partitioned join: SMJ sits directly on the two bucketed scans") {
    import SparkTestBase.collectInPlan
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    def side = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "2000000").option("bucketWidth", "62500").load()
    val a = side.select(col("bucket"), col("id"), col("amount_cents"))
    val b = side.filter(col("id") >= 500000L && col("id") < 1500000L)
      .select(col("bucket"), col("id"), col("channel"))
    val df = a.join(b, Seq("bucket", "id"))
      .groupBy(col("channel")).agg(count(lit(1)).as("n"))
    val n = df.collect().map(_.getLong(1)).sum
    assert(n == 1000000L)
    val plan = df.queryExecution.executedPlan
    val smjs = collectInPlan(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    // ZERO sorts anywhere (the scans report (bucket, id) ordering) and
    // the ONLY exchange is the final 5-group aggregate's — neither join
    // input shuffles
    assert(collectInPlan(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, s"reported ordering must remove every sort:\n$plan")
    val exchanges = collectInPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1,
      s"join inputs must not shuffle (only the final agg may):\n$plan")
    // and no exchange sits BELOW the join
    assert(collectInPlan(smjs.head.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"exchange below the storage-partitioned join:\n$plan")
  }

  test("storage-partitioned join survives MISMATCHED partition sets (pushPartValues)") {
    import SparkTestBase.collectInPlan
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // genuinely different bucket sets: 32 vs 24 partitions — the planner
    // must align the missing partition values, not fall back to shuffle
    val a = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "2000000").option("bucketWidth", "62500").load()
      .select(col("bucket"), col("id"), col("amount_cents"))
    val b = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "1500000").option("bucketWidth", "62500").load()
      .select(col("bucket"), col("id"), col("channel"))
    val df = a.join(b, Seq("bucket", "id"))
      .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("cents"))
    val r = df.collect().head
    assert(r.getLong(0) == 1500000L)
    assert(r.getLong(1) ==
      (0L until 1500000L).map(SynthDataSource.amountCents).sum)
    val plan = df.queryExecution.executedPlan
    val smjs = collectInPlan(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    assert(collectInPlan(smjs.head.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"mismatched partition sets fell back to a shuffle:\n$plan")
  }

  test("runtime filtering re-plans the scan to only key-bearing ranges") {
    // the DPP shape: dim filter on a NON-join attribute, so surviving
    // join keys exist only at runtime; the v2 scan must then plan fewer
    // partitions than the static 64 (keys live in [1, 60k] at sf0.001 —
    // only the slices covering that prefix of the 2M domain survive)
    val dir = "/root/testdata/sf0.001"
    val synth = spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "2000000").option("slices", "64").load()
      .select(col("id"), col("channel"), col("amount_cents"))
    val dim = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val joined = dim.join(synth, col("o_orderkey") === col("id"))
      .groupBy(col("channel")).agg(count(lit(1)).as("n"))
    val n = joined.collect().map(_.getLong(1)).sum
    val planned = SynthDataSource.lastPlannedPartitions.get()
    assert(planned >= 1 && planned < 64,
      s"runtime filter must drop empty id ranges: planned=$planned\n" +
        joined.queryExecution.executedPlan)
    // pruning is plan-only: the result equals the dim-side row count
    assert(n == graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") < 2000000L)
      .count())
    // and an unfiltered ROW scan still plans the full slice count (the
    // grouping key blocks aggregate pushdown, so this is a SynthScan —
    // count(*) alone would route to SynthAggScan, which has no ledger)
    synth.select((col("id") % 7L).as("g")).groupBy(col("g")).count().collect()
    assert(SynthDataSource.lastPlannedPartitions.get() == 64)
  }

  test("admission control survives every ReadLimit shape, incl. composite") {
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
    import graft.sources.{SynthMicroBatchStream, SynthOffset}
    val s = new SynthMicroBatchStream(
      graft.sources.SynthDataSource.Schema, 0L, 10000L, 4, 3000L)
    def off(o: Offset): Long = o.asInstanceOf[SynthOffset].n
    val start = s.initialOffset()
    assert(off(s.latestOffset(start, ReadLimit.maxRows(3000L))) == 3000L)
    assert(off(s.latestOffset(start, ReadLimit.allAvailable())) == 10000L)
    // CompositeReadLimit (what some Spark versions pass under
    // Trigger.AvailableNow): the TIGHTEST member cap must win — falling
    // through to the table end would silently drop admission control and
    // drain one mega-batch (ADVICE r12)
    val comp = ReadLimit.compositeLimit(
      Array(ReadLimit.allAvailable(), ReadLimit.maxRows(3000L)))
    assert(off(s.latestOffset(start, comp)) == 3000L,
      "composite limit lost the maxRows cap")
    // offsets round-trip the checkpoint log as json
    assert(off(s.deserializeOffset(
      s.latestOffset(start, ReadLimit.maxRows(3000L)).json())) == 3000L)
    // the bounded end clamps every cap
    assert(off(s.latestOffset(SynthOffset(9000L), ReadLimit.maxRows(3000L))) == 10000L)
  }
}
