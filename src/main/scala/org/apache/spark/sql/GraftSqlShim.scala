package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access shim: builds a DataFrame from a raw LogicalPlan
  * so library operators can inject custom logical nodes (the standard
  * pattern for Spark-native extension libraries; `Dataset.ofRows` is the
  * only construction path for plans the public DSL cannot express).
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst expression as a user-facing Column (the
    * construction path for custom expressions the public DSL cannot
    * spell).
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse: recover the Catalyst expression behind a Column. */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** -0.0/NaN canonicalization for grouping keys in custom physical plans
    * — the optimizer applies [[catalyst.optimizer.NormalizeFloatingNumbers]]
    * only to built-in Aggregate/Window/Join nodes.
    */
  def normalizeFloats(e: catalyst.expressions.Expression): catalyst.expressions.Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
