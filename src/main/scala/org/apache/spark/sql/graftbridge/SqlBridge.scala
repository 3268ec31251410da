package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` surface — the standard
  * pattern for libraries that ship custom Catalyst expressions (Spark 4
  * removed the public Column(Expression) constructor; wrapping and
  * session-local function registration both live behind `private[sql]`).
  * Kept to exactly two capabilities; everything else in the engine uses
  * the public API.
  */
object SqlBridge {

  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * `private[sql]`) — the entry point for the engine's native logical
    * operators (graft.plans).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Apply an extensions hook to a fresh SparkSessionExtensions and
    * return the planner strategies it registered (the builder is
    * `private[sql]`) — lets specs pin what GraftExtensions injects
    * without tearing down the shared test session.
    */
  def plannerStrategiesOf(spark: SparkSession,
      hook: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] = {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    hook(e)
    e.buildPlannerStrategies(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  }

  /** Register a session-local SQL function (the imperative counterpart of
    * SparkSessionExtensions.injectFunction, for sessions the engine did
    * not build).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
    ()
  }
}
