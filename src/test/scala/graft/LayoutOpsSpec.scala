package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

class LayoutOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    SparkTestBase.collectInPlan(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }

  /** Independent Morton reference: straight bit twiddling, no SQL. */
  private def morton(x: Long, y: Long): Long =
    (0 until LayoutOps.ZBits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue SQL == reference bit-twiddled Morton interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)(
      (rnd.nextInt(1 << LayoutOps.ZBits).toLong,
       rnd.nextInt(1 << LayoutOps.ZBits).toLong))
    val rows = pairs.toDF("x", "y")
      .withColumn("z", expr(LayoutOps.zValue("x", "y", duck = false)))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("month filter reaches the partitioned scan as a PartitionFilter and prunes files") {
    import org.apache.spark.sql.functions.col
    val root = LayoutOps.partitionedOrdersRoot(spark, dir)
    val table = spark.read.parquet(root)
    val pruned = table.filter(col("o_month") === LayoutOps.PruneMonth)
    val plan = pruned.queryExecution.executedPlan.toString
    // o_month must appear INSIDE the PartitionFilters bracket — the key
    // itself prints (empty) even when pruning regresses to a row filter
    assert("PartitionFilters: \\[[^\\]]*o_month".r.findFirstIn(plan).isDefined,
      s"month predicate must prune partitions, not filter rows:\n$plan")
    // inputFiles lists the relation pre-pruning; the scan node knows
    // which partitions survived
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the pruned plan"))
    val allFiles = table.inputFiles.length
    val prunedFiles = scan.selectedPartitions.totalNumberOfFiles
    assert(prunedFiles < allFiles,
      s"pruned scan reads $prunedFiles of $allFiles files — nothing pruned")
  }

  test("dpp star join turns the dim filter into a runtime partition filter") {
    val df = LayoutOps.dppStarJoin(spark, dir)
    val rows = df.collect()
    // quarter 2 = months 4..6, all present in the generated year
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(4, 5, 6), rows.mkString(";"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"dim filter must prune fact partitions at runtime:\n$plan")
    val scan = fileScans(df.queryExecution.executedPlan)
      .find(_.toString.contains("PartitionFilters: [isnotnull(o_month"))
      .getOrElse(fail("no partitioned fact scan in the plan"))
    val all = spark.read.parquet(LayoutOps.partitionedOrdersRoot(spark, dir))
      .inputFiles.length
    // selectedPartitions reflects only STATIC filters; the runtime-pruned
    // file count is the scan's numFiles metric, populated by the collect
    val kept = scan.metrics("numFiles").value
    assert(kept < all, s"DPP kept $kept of $all files — nothing pruned")
  }

  test("every quadtree cell bounds both dimension spans below CellSpan") {
    val cells = LayoutOps.zorderCells(Tables.lineitem(spark, dir))
    assert(cells.filter(col("bounded") === 0).count() == 0,
      "a z-cell exceeded the 2^CellLevel per-dimension span bound")
  }
}
