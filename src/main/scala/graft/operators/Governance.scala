package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance operators: keyed purge (right-to-be-forgotten) with a
  * completeness audit.
  *
  * The purge itself is the scalable anti-join shape: deletion requests
  * are small by nature, so the tombstone keys BROADCAST and every
  * affected table drops its rows in one narrow pass — no shuffle of the
  * 100 TB fact side (on a lakehouse table format the same anti-join
  * drives a MERGE DELETE with file pruning). What actually needs to be
  * oracle-checked is the AUDIT a compliance pipeline runs afterwards:
  * tombstone count, survivor counts, and — the referential part — that
  * no surviving fact row references a purged dimension key.
  */
object Governance {

  /** Deterministic deletion-request slice. */
  val TombMod = 97
  val TombRem = 13

  def purgeAudit(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val tomb = cust.filter(col("c_custkey") % TombMod === TombRem)
      .select(col("c_custkey").as("k"))
    val keptC = cust.join(broadcast(tomb), col("c_custkey") === col("k"), "left_anti")
    val keptO = orders.join(broadcast(tomb), col("o_custkey") === col("k"), "left_anti")
    val orphans = keptO.join(keptC.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
    tomb.agg(count(lit(1)).as("n_tombstones"))
      .crossJoin(keptC.agg(count(lit(1)).as("n_customers_left")))
      .crossJoin(keptO.agg(count(lit(1)).as("n_orders_left")))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphan_orders")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_purge_audit" -> ((s, dir) => purgeAudit(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_purge_audit" ->
      s"""WITH tomb AS (SELECT c_custkey FROM customer
         |   WHERE c_custkey % $TombMod = $TombRem),
         | kc AS (SELECT c_custkey FROM customer
         |   WHERE c_custkey NOT IN (SELECT c_custkey FROM tomb)),
         | ko AS (SELECT o_custkey FROM orders
         |   WHERE o_custkey NOT IN (SELECT c_custkey FROM tomb)),
         | orph AS (SELECT o_custkey FROM ko
         |   WHERE o_custkey NOT IN (SELECT c_custkey FROM kc))
         |SELECT (SELECT count(*) FROM tomb) AS n_tombstones,
         | (SELECT count(*) FROM kc) AS n_customers_left,
         | (SELECT count(*) FROM ko) AS n_orders_left,
         | (SELECT count(*) FROM orph) AS n_orphan_orders""".stripMargin
  )
}
