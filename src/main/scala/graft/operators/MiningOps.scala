package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral mining over the warehouse — the segmentation and
  * co-occurrence analyses the reference's BI layer implies (customer
  * tiles + channel mix on the dashboard, README.md:83-97), computed
  * natively.
  */
object MiningOps {

  /** RFM customer segmentation: per-customer recency (latest order day),
    * frequency (order count), monetary (exact cents), each cut into
    * quartiles by `ntile(4)` under a deterministic (metric, custkey)
    * total order, then counted per 3-digit RFM code. One shuffle builds
    * the per-customer frame; the three ntile windows run over that
    * one-row-per-customer frame, not the fact table. At 100 TB the exact
    * ntile swaps for approx-quantile cut points broadcast against the
    * same frame (sketch-cut segmentation); the code structure — metrics
    * pass, cut pass, code rollup — is the deployment shape.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val m = orders.groupBy(col("o_custkey").as("cust"))
      .agg(max(expr("CAST(o_orderdate AS DATE)")).as("last_day"),
        count(lit(1)).as("f"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m"))
      .select(col("cust"), datediff(col("last_day"), lit("1970-01-01")).as("r"),
        col("f"), col("m"))
    def quart(c: String) =
      ntile(4).over(Window.orderBy(col(c).asc, col("cust").asc))
    m.select(col("cust"),
        quart("r").as("r_q"), quart("f").as("f_q"), quart("m").as("m_q"))
      .groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm_code"))
      .agg(count(lit(1)).as("customers"))
  }

  /** Market-basket co-purchase: brand pairs appearing on the same order.
    * Reduce FIRST, pair SECOND: one broadcast join tags each line's
    * brand, a distinct collapses to (order, brand) — the frame the pair
    * join actually needs, bounded by distinct brands per basket — and
    * only then the self-join emits ordered pairs (b1 < b2 directly, so
    * no least/greatest normalize and no post-join dedup). Pair counts
    * stay linear in orders x brands-per-basket²; pairing partkey-level
    * lines and deduping afterwards measured ~3x the task CPU for the
    * same answer.
    */
  def coPurchase(spark: SparkSession, dir: String): DataFrame = {
    val brands = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    // NOT balanced: measured at sf0.1, repartitioning the scan made this
    // SLOWER (3.0s -> 3.9-4.7s; task cpu 2.9s -> 11.6s) — the wall here
    // is dominated by cold whole-stage-codegen compile (process cpu 8.5s
    // vs task cpu 2.9s), which extra exchanges only add stages to. At
    // multi-row-group scale the scan parallelizes by itself.
    val orderBrands = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .join(broadcast(brands), col("pk") === col("p_partkey"))
      .select(col("ok"), col("p_brand").as("b"))
      .distinct()
    orderBrands.join(
        orderBrands.select(col("ok").as("ok2"), col("b").as("b2")),
        col("ok") === col("ok2") && col("b") < col("b2"))
      .groupBy(col("b").as("b1"), col("b2"))
      .agg(count(lit(1)).as("n_orders"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rfm" -> ((s, dir) => rfmSegments(Tables.orders(s, dir))),
    "q_copurchase" -> ((s, dir) => coPurchase(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_rfm" ->
      """WITH m AS (SELECT o_custkey AS cust,
        |   CAST(date_diff('day', DATE '1970-01-01',
        |     CAST(max(o_orderdate) AS DATE)) AS INT) AS r,
        |   count(*) AS f,
        |   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
        |  FROM orders GROUP BY 1),
        |q AS (SELECT cust,
        |   ntile(4) OVER (ORDER BY r, cust) AS r_q,
        |   ntile(4) OVER (ORDER BY f, cust) AS f_q,
        |   ntile(4) OVER (ORDER BY m, cust) AS m_q
        |  FROM m)
        |SELECT r_q * 100 + f_q * 10 + m_q AS rfm_code,
        |       count(*) AS customers
        |FROM q GROUP BY 1""".stripMargin,

    "q_copurchase" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk,
        |   p_brand AS b FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pairs AS (SELECT DISTINCT a.ok,
        |   least(a.b, b.b) AS b1, greatest(a.b, b.b) AS b2
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  WHERE a.b <> b.b)
        |SELECT b1, b2, count(*) AS n_orders
        |FROM pairs GROUP BY 1, 2""".stripMargin
  )
}
