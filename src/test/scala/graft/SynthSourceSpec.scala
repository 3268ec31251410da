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
