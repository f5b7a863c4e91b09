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
}
