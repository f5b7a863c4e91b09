package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric determinism helpers (shared by all query files).
  *
  * A double SUM is accumulation-order dependent; Spark combines partition
  * partials in completion order, so the low bits differ run-to-run and vs
  * DuckDB — enough to flip a round(x, 2) at a .xx5 boundary (observed at
  * sf0.01). Summing in DECIMAL(38,10) is exact and order-independent; both
  * engines then convert the identical decimal to the identical double.
  * Averages are derived as exact-sum / count with one IEEE double division
  * so both engines execute the same float ops in the same order.
  *
  * Oracle-side equivalents (DuckDB):
  *   sumD:  CAST(round(sum(CAST(x AS DECIMAL(38,10))), s) AS DOUBLE)
  *   avgD:  round(CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)/count(x), s)
  */
object Num {
  def dec(c: Column): Column = c.cast("decimal(38,10)")
  def sumD(c: Column, scale: Int): Column =
    round(sum(dec(c)), scale).cast("double")
  def avgD(c: Column, scale: Int): Column =
    round(sum(dec(c)).cast("double") / count(c), scale)
}
