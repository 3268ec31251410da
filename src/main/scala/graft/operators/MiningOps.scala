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
    * Self-join of lineitem on the order key — bounded per order by the
    * line count, so the pair explosion is linear in orders, not
    * quadratic in lineitems globally — then two broadcast joins to the
    * part dim for brands, normalized with least/greatest so a pair
    * counts once regardless of line order, and DISTINCT per order so a
    * brand pair counts once per basket.
    */
  def coPurchase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val brands = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    val a = li.join(broadcast(brands), col("pk") === col("p_partkey"))
      .select(col("ok"), col("p_brand").as("b_a"), col("pk").as("pk_a"))
    val b = li.join(broadcast(brands), col("pk") === col("p_partkey"))
      .select(col("ok").as("ok_b"), col("p_brand").as("b_b"), col("pk").as("pk_b"))
    a.join(b, col("ok") === col("ok_b") && col("pk_a") < col("pk_b"))
      .select(col("ok"),
        least(col("b_a"), col("b_b")).as("b1"),
        greatest(col("b_a"), col("b_b")).as("b2"))
      .filter(col("b1") =!= col("b2"))
      .distinct()
      .groupBy("b1", "b2").agg(count(lit(1)).as("n_orders"))
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
