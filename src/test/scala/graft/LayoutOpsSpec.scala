package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

class LayoutOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

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

  test("every quadtree cell bounds both dimension spans below CellSpan") {
    val cells = LayoutOps.zorderCells(Tables.lineitem(spark, dir))
    assert(cells.filter(col("bounded") === 0).count() == 0,
      "a z-cell exceeded the 2^CellLevel per-dimension span bound")
  }
}
