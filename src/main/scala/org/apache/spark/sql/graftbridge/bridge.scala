package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's unified `Column` wraps a
  * `ColumnNode` rather than an `Expression`, and the classic converters are
  * `private[sql]` — so this one-file subpackage (the standard pattern used
  * by open-source Spark extension libraries) re-exports the two converters
  * the engine needs to expose its native Catalyst expressions as Columns.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session's registry (for new
    * sessions, prefer `GraftExtensions` via `spark.sql.extensions`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Execute a hand-built LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — lets specs run a plan after applying an optimizer
    * rule directly, independent of session-level extension wiring. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a LIVE session (new sessions get
    * it through `GraftExtensions`' injectPlannerStrategy). */
  def registerStrategy(spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }
}
