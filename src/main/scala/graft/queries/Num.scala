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

  /** Money-grade variants: decimal(18,6) keeps Spark's Decimal on its
    * compact-long fast path (precision ≤ 18 avoids 128-bit arithmetic —
    * measured ~2x on the 600k-row lineitem aggregations) and is exact for
    * columns whose TRUE values carry at most 4 decimal digits (prices,
    * discounts, their products): rounding such a double at 1e-6 can never
    * sit on a tie, so both engines land on the identical decimal. The
    * sum's result type widens to decimal(28,6), so scale-up cannot
    * overflow the accumulator. Use ONLY for provably ≤4-decimal data;
    * arbitrary doubles (e.g. events.value) stay on dec/sumD.
    */
  def decM(c: Column): Column = c.cast("decimal(18,6)")
  def sumM(c: Column, scale: Int): Column =
    round(sum(decM(c)), scale).cast("double")
  def avgM(c: Column, scale: Int): Column =
    round(sum(decM(c)).cast("double") / count(c), scale)
}
