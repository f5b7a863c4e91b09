package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validation gates — the reference's abort-on-violation runtime checks
  * (SURVEY.md §2.2 P8, §2.4 A10, §4 "uniqueness pre-checks").
  *
  * These are deliberate driver-side *actions*, mirroring
  * `/root/reference/scripts/clean_ticket_sales.py:80-88,116-120` and the
  * pandas `merge(validate="m:1")` contract at
  * `/root/reference/scripts/transform_weather.py:92-96`. Each extra action
  * costs a job, so they are opt-in for benchmark paths.
  */
object Validate {

  final case class ValidationException(msg: String) extends RuntimeException(msg)

  /** P8 — required-column set check; plan-time only (no job). */
  def requireColumns(df: DataFrame, required: Set[String], context: String = ""): DataFrame = {
    val missing = required -- df.columns.toSet
    if (missing.nonEmpty)
      throw ValidationException(s"$context missing required columns: ${missing.toSeq.sorted.mkString(", ")}")
    df
  }

  /** A10 — duplicate-key guard: abort when `keys` are not unique. One
    * aggregate job; the count of offending keys is bounded by `sampleSize`
    * rows collected for the message.
    */
  def assertUniqueKeys(df: DataFrame, keys: Seq[String], context: String = "", sampleSize: Int = 10): DataFrame = {
    val dups = df.groupBy(keys.map(col).toIndexedSeq: _*).count().filter(col("count") > 1)
    val sample = dups.limit(sampleSize).collect()
    if (sample.nonEmpty)
      throw ValidationException(
        s"$context duplicate keys on (${keys.mkString(",")}): sample=${sample.mkString("; ")}")
    df
  }

  /** m:1 join contract (pandas `validate="m:1"`): the *right* side must be
    * unique on the join keys — i.e. an enrichment dimension.
    */
  def assertM1(right: DataFrame, keys: Seq[String], context: String = ""): DataFrame =
    assertUniqueKeys(right, keys, s"$context [m:1 right side]")

  /** F8 — warn-only integrity check (`total_spend == round(price*n, 2)`,
    * clean_ticket_sales.py:97-101). Returns the violation count.
    */
  def integrityWarnCount(df: DataFrame, expected: org.apache.spark.sql.Column,
                         actual: org.apache.spark.sql.Column): Long =
    df.filter(bround(expected, 2) =!= bround(actual, 2)).count()
}
