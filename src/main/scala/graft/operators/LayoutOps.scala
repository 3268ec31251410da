package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableSql.shr

/** Data-layout operators: Z-order (Morton) clustering and the file-
  * skipping audit it enables.
  *
  * At 100 TB the dominant cost of a selective query is which FILES it
  * has to open. A table sorted on one key bounds only that key's range
  * per file; interleaving the bits of two keys (the Morton curve) and
  * clustering on the interleaved value bounds BOTH ranges at once —
  * every aligned z-range of length 4^j is a quadtree cell spanning at
  * most 2^j distinct values of each dimension, so min/max file stats
  * prune on either predicate. This is the layout trick behind
  * Delta/Iceberg `ZORDER BY` and the classic UB-tree.
  *
  * Operators (both one narrow projection + one shuffle on the cell id):
  *   - [[zorderCells]]: per-quadtree-cell occupancy and min/max spans of
  *     both dimensions — the stats a z-ordered writer would persist per
  *     file, with the span bound checked in-row (`bounded` must be 1
  *     everywhere, and a spec asserts the 2^j bound is the REASON);
  *   - [[zorderSkip]]: the audit a query planner runs against those
  *     stats — for a box predicate on (x, y), how many cells a min/max
  *     check prunes. One row: total cells, touched cells, skip ratio.
  *
  * The z-value is pure integer arithmetic (shift/mod/multiply), so it
  * whole-stage-codegens in Spark and the DuckDB oracle computes the
  * identical curve from a shared SQL fragment.
  */
object LayoutOps {

  /** Bits interleaved per dimension (keys here fit in 16 bits at every
    * test SF; a deployment sizes this off the key domain).
    */
  val ZBits = 16

  /** Quadtree level of the audit cells: dropping `2 * CellLevel` low
    * z-bits yields cells spanning at most 2^CellLevel = [[CellSpan]]
    * distinct values per dimension.
    */
  val CellLevel = 6
  val CellSpan: Long = 1L << CellLevel // 64

  /** Box predicate for the skip audit (partkey 1000±, suppkey low half
    * at sf0.01 — selective on both dims at every test SF).
    */
  val BoxX0 = 900L; val BoxX1 = 1100L; val BoxY0 = 1L; val BoxY1 = 40L

  /** Morton z-value of (x, y): bit i of x lands at z-bit 2i, bit i of y
    * at 2i+1. Shift/mod/multiply only — portable across both engines.
    */
  def zValue(x: String, y: String, duck: Boolean): String = {
    val terms = (0 until ZBits).flatMap { i =>
      Seq(
        s"(${shr(x, i, duck)} % 2) * ${1L << (2 * i)}",
        s"(${shr(y, i, duck)} % 2) * ${1L << (2 * i + 1)}")
    }
    s"CAST(${terms.mkString("(", " + ", ")")} AS BIGINT)"
  }

  /** Shared projection: (x, y, cell) over lineitem's (partkey, suppkey). */
  private def cellExpr(duck: Boolean): String =
    shr(zValue("l_partkey", "l_suppkey", duck), 2 * CellLevel, duck)

  def zorderCells(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        expr(cellExpr(duck = false)).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .select(col("cell"), col("n"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"),
        ((col("max_x") - col("min_x") < CellSpan) &&
         (col("max_y") - col("min_y") < CellSpan)).cast("int").as("bounded"))

  /** Cells a (BoxX, BoxY) box predicate cannot prune via min/max stats:
    * range overlap on both dims. skip_ratio is the fraction of files a
    * z-ordered layout never opens for this query.
    */
  def zorderSkip(lineitem: DataFrame): DataFrame =
    zorderCells(lineitem)
      .select(col("cell"),
        (col("min_x") <= BoxX1 && col("max_x") >= BoxX0 &&
         col("min_y") <= BoxY1 && col("max_y") >= BoxY0).cast("long").as("touched"))
      .agg(count(lit(1)).as("n_cells"), sum(col("touched")).as("n_touched"))
      .select(col("n_cells"), col("n_touched"),
        round(lit(1.0) - col("n_touched").cast("double") / col("n_cells"), 6)
          .as("skip_ratio"))

  /** Linear layout contrast: the same per-file stats when the table is
    * clustered on x ALONE (a plain `ORDER BY x` write). x-spans are
    * bounded, y-spans are the full domain.
    */
  def linearCells(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        expr(s"${shr("l_partkey", CellLevel, duck = false)}").as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** The design-choice query: z-order vs linear clustering, skip ratios
    * for a 2D box predicate and a y-only predicate, in one frame. The
    * xy box prunes well under BOTH layouts (it is selective on x); the
    * y-only predicate is where linear-on-x collapses to a full scan
    * while z-cells still prune — the quantified case for Morton layout
    * when queries filter on either dimension.
    */
  def layoutCompare(lineitem: DataFrame): DataFrame = {
    def skipRow(cells: DataFrame, layout: String, pred: String,
        touched: org.apache.spark.sql.Column): DataFrame =
      cells.select(touched.cast("long").as("t"))
        .agg(count(lit(1)).as("n_cells"), sum(col("t")).as("n_touched"))
        .select(lit(layout).as("layout"), lit(pred).as("predicate"),
          col("n_cells"), col("n_touched"),
          round(lit(1.0) - col("n_touched").cast("double") / col("n_cells"), 6)
            .as("skip_ratio"))
    val xyBox = col("min_x") <= BoxX1 && col("max_x") >= BoxX0 &&
      col("min_y") <= BoxY1 && col("max_y") >= BoxY0
    val yOnly = col("min_y") <= BoxY1 && col("max_y") >= BoxY0
    val z = zorderCells(lineitem)
    val lin = linearCells(lineitem)
    skipRow(z, "zorder", "xy_box", xyBox)
      .unionAll(skipRow(z, "zorder", "y_only", yOnly))
      .unionAll(skipRow(lin, "linear_x", "xy_box", xyBox))
      .unionAll(skipRow(lin, "linear_x", "y_only", yOnly))
  }

  /** Month the pruned read filters on. */
  val PruneMonth = 3

  /** Hive-partitioned table root for `orders`, written once per source
    * content (the StreamQueries.fixtureDir content-keying discipline):
    * one directory per o_month, the layout the reference's
    * date-partitioned BigQuery fact table maps to on a lakehouse.
    */
  def partitionedOrdersRoot(s: SparkSession, dir: String): String = {
    val root = graft.streaming.StreamQueries.fixtureDir("partorders", dir, "orders")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_SUCCESS")))
      Tables.orders(s, dir)
        .withColumn("o_month", month(expr("CAST(o_orderdate AS DATE)")))
        .write.mode("overwrite").partitionBy("o_month").parquet(root)
    root
  }

  /** Partition-pruned read: month filter on a hive-partitioned table
    * reaches the scan as a PartitionFilter (pinned in LayoutOpsSpec), so
    * only that month's directory is listed and read — the reference's
    * partitioned-fact-table query pattern, and at 100 TB the difference
    * between scanning one partition and scanning the table. The oracle
    * computes the same aggregate from the UNPARTITIONED source (an
    * independent path — any partition-write bug that drops or
    * duplicates rows breaks the match).
    */
  def partitionPruned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(partitionedOrdersRoot(s, dir))
      .filter(col("o_month") === PruneMonth)
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_cents"))

  /** Quarter the DPP dim filter selects (months 4-6). */
  val DppQuarter = 2

  /** File-backed month->quarter dim for the DPP join. The dim MUST be a
    * file relation: an in-memory `Seq.toDF.filter(...)` is constant-
    * folded to a bare LocalRelation by `ConvertToLocalRelation` before
    * the optimizer's `PartitionPruning` rule looks for a selective
    * build-side predicate, so DPP silently never fires (round-7 lesson —
    * the join was answer-correct but read all 12 month directories). A
    * parquet-backed dim keeps the `Filter` node alive through planning,
    * which is also the realistic shape: at 100 TB the quarter dim is a
    * catalog table, not a literal.
    */
  def monthDimRoot(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = graft.streaming.StreamQueries.fixtureDir("monthdim", dir, "orders")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_SUCCESS")))
      (1 to 12).map(m => (m, (m - 1) / 3 + 1)).toDF("o_month", "quarter")
        .coalesce(1).write.mode("overwrite").parquet(root)
    root
  }

  /** Dynamic-partition-pruning star join — the 100 TB star-join
    * workhorse: the fact side is the hive-partitioned orders table, the
    * dim side a tiny month->quarter mapping filtered to one quarter.
    * The months surviving the dim filter are only known at RUNTIME, so
    * static partition pruning can't fire; Spark's DPP turns the
    * broadcast build side into a partition filter on the fact scan
    * (`dynamicpruningexpression` in PartitionFilters — pinned in
    * LayoutOpsSpec), so 9 of 12 month directories are never listed or
    * read. The oracle recomputes from the UNPARTITIONED source through
    * the quarter arithmetic — a dropped or double-written partition
    * breaks the match.
    */
  def dppStarJoin(s: SparkSession, dir: String): DataFrame = {
    val monthDim = s.read.parquet(monthDimRoot(s, dir))
    s.read.parquet(partitionedOrdersRoot(s, dir))
      .join(broadcast(monthDim.filter(col("quarter") === DppQuarter)), "o_month")
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_cents"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dpp_join" -> ((s, dir) => dppStarJoin(s, dir)),
    "q_zorder_cells" -> ((s, dir) => zorderCells(Tables.lineitem(s, dir))),
    "q_zorder_skip" -> ((s, dir) => zorderSkip(Tables.lineitem(s, dir))),
    "q_layout_compare" -> ((s, dir) => layoutCompare(Tables.lineitem(s, dir))),
    "q_partition_prune" -> ((s, dir) => partitionPruned(s, dir))
  )

  def oracleSql: Map[String, String] = {
    val cells =
      s"""SELECT ${cellExpr(duck = true)} AS cell, count(*) AS n,
         |  min(l_partkey) AS min_x, max(l_partkey) AS max_x,
         |  min(l_suppkey) AS min_y, max(l_suppkey) AS max_y
         | FROM lineitem GROUP BY 1""".stripMargin
    Map(
      "q_dpp_join" ->
        s"""SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_month,
           | count(*) AS n_orders,
           | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |   AS rev_cents
           |FROM orders
           |WHERE (month(CAST(o_orderdate AS DATE)) - 1) // 3 + 1 = $DppQuarter
           |GROUP BY 1""".stripMargin,

      "q_partition_prune" ->
        s"""SELECT count(*) AS n_orders,
           | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |   AS rev_cents
           |FROM orders
           |WHERE month(CAST(o_orderdate AS DATE)) = $PruneMonth""".stripMargin,

      "q_zorder_cells" ->
        s"""SELECT cell, n, min_x, max_x, min_y, max_y,
           | CAST(max_x - min_x < $CellSpan AND max_y - min_y < $CellSpan AS INT)
           |   AS bounded
           |FROM ($cells) c""".stripMargin,

      "q_layout_compare" -> {
        val linCells =
          s"""SELECT ${shr("l_partkey", CellLevel, duck = true)} AS cell,
             |  count(*) AS n,
             |  min(l_partkey) AS min_x, max(l_partkey) AS max_x,
             |  min(l_suppkey) AS min_y, max(l_suppkey) AS max_y
             | FROM lineitem GROUP BY 1""".stripMargin
        def row(src: String, layout: String, pred: String, cond: String) =
          s"""SELECT '$layout' AS layout, '$pred' AS predicate,
             | count(*) AS n_cells,
             | CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_touched,
             | round(1.0 - sum(CASE WHEN $cond THEN 1 ELSE 0 END)
             |   / CAST(count(*) AS DOUBLE), 6) AS skip_ratio
             |FROM ($src) c""".stripMargin
        val xy = s"min_x <= $BoxX1 AND max_x >= $BoxX0 AND min_y <= $BoxY1 AND max_y >= $BoxY0"
        val yo = s"min_y <= $BoxY1 AND max_y >= $BoxY0"
        Seq(
          row(cells, "zorder", "xy_box", xy), row(cells, "zorder", "y_only", yo),
          row(linCells, "linear_x", "xy_box", xy), row(linCells, "linear_x", "y_only", yo)
        ).mkString("\nUNION ALL\n")
      },

      "q_zorder_skip" ->
        s"""SELECT count(*) AS n_cells,
           | CAST(sum(CASE WHEN min_x <= $BoxX1 AND max_x >= $BoxX0
           |   AND min_y <= $BoxY1 AND max_y >= $BoxY0 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_touched,
           | round(1.0 - sum(CASE WHEN min_x <= $BoxX1 AND max_x >= $BoxX0
           |   AND min_y <= $BoxY1 AND max_y >= $BoxY0 THEN 1 ELSE 0 END)
           |   / CAST(count(*) AS DOUBLE), 6) AS skip_ratio
           |FROM ($cells) c""".stripMargin
    )
  }
}
