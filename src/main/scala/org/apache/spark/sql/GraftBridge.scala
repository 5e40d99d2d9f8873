package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's private[sql] Column<->Expression
  * converters, so graft's native Catalyst expressions can be exposed
  * through the public Column API. This is the standard extension-point
  * shim pattern for libraries shipping custom expressions; nothing
  * else in the engine lives under the Spark namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def analyzedPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the async listener bus so a metrics listener's counters are
    * complete before a snapshot — the bench's per-query shuffle/spill
    * attribution would otherwise leak a query's trailing task-end
    * events into its successor's window. private[spark], hence here. */
  def flushListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
