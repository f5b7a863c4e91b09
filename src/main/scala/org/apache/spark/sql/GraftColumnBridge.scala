package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column` to a connect-compatible façade, so the Spark-3
  * idiom `new Column(expr)` is gone and the replacement
  * (`classic.ExpressionUtils`) is `private[sql]`. This thin bridge lives in
  * the `org.apache.spark.sql` package purely to re-export the two
  * conversions graft needs to surface custom Catalyst expressions as
  * user-facing `Column`s. No Spark behavior is modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Late SQL-function registration on a live session (the
    * `SparkSessionExtensions` hook only runs at session construction;
    * `sessionState` is `private[sql]`, hence the bridge).
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** Wrap an explicitly-built logical plan as a DataFrame
    * (`Dataset.ofRows` is `private[sql]`). Lets a query run a specific
    * plan rewrite unconditionally — e.g. the window→agg-join rule —
    * without flipping session-wide optimizer state.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
