package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The third §2.9 aggregate flavor: a user-facing typed
  * `Aggregator[IN, BUF, OUT]` over a case-class `Dataset` — the API a
  * library consumer writes against (the catalyst-level
  * TypedImperativeAggregate in functions/VectorAggregates is the
  * engine-internal flavor; scalar expressions are the first).
  *
  * Money rides as exact integer cents (decimal-derived, never
  * round(double)) so the typed path is oracle-comparable bit-for-bit:
  * count/sum/min/max over longs have no accumulation-order sensitivity.
  */
object TypedAgg {

  case class TxnRow(status: String, cents: Long)
  case class MoneyStats(n_txns: Long, total_cents: Long,
      min_cents: Long, max_cents: Long)

  /** count/sum/min/max in one typed pass. The zero's MaxValue/MinValue
    * sentinels are safe: groupByKey only creates non-empty groups, and
    * merge of a zero buffer (a partition that saw no rows for the key)
    * keeps the other side's extrema.
    */
  object MoneyStatsAggregator extends Aggregator[TxnRow, MoneyStats, MoneyStats] {
    override def zero: MoneyStats =
      MoneyStats(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: MoneyStats, a: TxnRow): MoneyStats =
      MoneyStats(b.n_txns + 1, b.total_cents + a.cents,
        math.min(b.min_cents, a.cents), math.max(b.max_cents, a.cents))
    override def merge(b1: MoneyStats, b2: MoneyStats): MoneyStats =
      MoneyStats(b1.n_txns + b2.n_txns, b1.total_cents + b2.total_cents,
        math.min(b1.min_cents, b2.min_cents), math.max(b1.max_cents, b2.max_cents))
    override def finish(r: MoneyStats): MoneyStats = r
    override def bufferEncoder: Encoder[MoneyStats] = Encoders.product[MoneyStats]
    override def outputEncoder: Encoder[MoneyStats] = Encoders.product[MoneyStats]
  }

  /** Per-status money stats through the typed Dataset API end-to-end:
    * case-class rows in, groupByKey, typed aggregator, flattened out.
    * Plans as the same partial+final hash aggregate as the untyped
    * equivalent — typed safety without a different physical shape.
    */
  def moneyStatsByStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("status"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[TxnRow]
    ds.groupByKey(_.status)
      .agg(MoneyStatsAggregator.toColumn.name("stats"))
      .select(col("key").as("o_orderstatus"),
        col("stats.n_txns").as("n_txns"),
        col("stats.total_cents").as("total_cents"),
        col("stats.min_cents").as("min_cents"),
        col("stats.max_cents").as("max_cents"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_agg" -> ((s, dir) => moneyStatsByStatus(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_typed_agg" ->
      """SELECT o_orderstatus,
        | count(*) AS n_txns,
        | CAST(sum(cents) AS BIGINT) AS total_cents,
        | CAST(min(cents) AS BIGINT) AS min_cents,
        | CAST(max(cents) AS BIGINT) AS max_cents
        |FROM (SELECT o_orderstatus,
        |   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders) t
        |GROUP BY o_orderstatus""".stripMargin
  )
}
