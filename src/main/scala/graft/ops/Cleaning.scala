package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable cleaning kernel — the scalar-function surface of the reference
  * pipeline (SURVEY.md §2.6, F1–F19), expressed as pure `Column`
  * transformations so every use stays inside whole-stage codegen.
  *
  * Reference semantics replicated from
  * `/root/reference/scripts/clean_ticket_sales.py:28-41`,
  * `/root/reference/scripts/transform_weather.py:21-26`,
  * `/root/reference/scripts/clean_section_capacity.py:38-44`.
  */
object Cleaning {

  /** F1/P1 — header normalization: trim, lowercase, single-space → `_`.
    * Matches the reference's literal `.replace(" ", "_")`
    * (clean_ticket_sales.py:28-35): `"a  b"` → `a__b`, not `a_b`.
    */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.trim.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** Python `str.title()` semantics: a letter is uppercased when preceded
    * by a non-letter, lowercased otherwise — so `"upper-deck"` →
    * `"Upper-Deck"` and `"they're"` → `"They'Re"`. Spark's `initcap` only
    * capitalizes after whitespace, which diverges on hyphens/apostrophes.
    * Implemented by splitting into letter/non-letter runs and casing each
    * letter run — pure built-ins, stays in codegen.
    */
  def pythonTitle(c: Column): Column =
    array_join(
      transform(
        regexp_extract_all(c.cast("string"), lit("[\\p{L}]+|[^\\p{L}]+"), lit(0)),
        run =>
          when(run.rlike("^[\\p{L}]"),
            concat(upper(substring(run, 1, 1)), lower(substring(run, 2, Int.MaxValue))))
            .otherwise(run)),
      "")

  /** F1 — canonical section/category names: cast→string, trim, collapse
    * inner whitespace, Title Case (`str.title()` parity via
    * [[pythonTitle]]). (clean_ticket_sales.py:37-41)
    */
  def normTitle(c: Column): Column =
    // collapse BEFORE trim: Spark's trim only strips the space character,
    // but Python str.strip() removes all whitespace — collapsing first
    // turns any leading/trailing whitespace run into a single space,
    // which trim then removes.
    pythonTitle(trim(regexp_replace(c.cast("string"), "\\s+", " ")))

  /** F2 — slugify: join parts with `_`, lowercase, non-alphanumeric runs →
    * `_`, strip leading/trailing `_`. (transform_weather.py:21-26)
    */
  def slugify(parts: Column*): Column =
    regexp_replace(
      regexp_replace(lower(concat_ws("_", parts: _*)), "[^a-z0-9]+", "_"),
      "^_+|_+$", "")

  /** F4 — multi-format date parse with coerce-to-null: the reference sees
    * both `M/d/yyyy` raw dates and ISO dates and maps unparsable values to
    * null (`errors="coerce"`, clean_ticket_sales.py:91). `try_to_date`
    * keeps that semantic even under Spark 4's default ANSI mode.
    */
  def parseDateMulti(c: Column): Column =
    coalesce(
      try_to_date(c),
      try_to_date(c, "M/d/yyyy"),
      try_to_date(c, "M-d-yyyy"))

  /** F7 — numeric coercion, null on failure (`pd.to_numeric(errors="coerce")`). */
  def coerceDouble(c: Column): Column = trim(c.cast("string")).try_cast("double")

  /** F7 — like [[coerceDouble]] but integral (pandas `Int64` ≈ nullable
    * LongType). Tries a direct integral parse first so 64-bit values above
    * 2^53 survive exactly; a decimal-looking string falls back through
    * double ONLY when it holds an integral value ("2.0" → 2). A
    * non-integral value ("1.5") yields null — pandas raises on
    * `astype("Int64")` of a fractional float, so silent truncation would
    * diverge from the reference; null is the coerce-semantics analog.
    */
  def coerceLong(c: Column): Column = {
    val d = coerceDouble(c)
    coalesce(
      trim(c.cast("string")).try_cast("long"),
      when(d === floor(d), d).try_cast("long"))
  }

  /** F9 — banker's rounding block: pandas `round` is half-even; Spark's
    * `round` is half-away-from-zero, so pipeline-parity code must use
    * `bround`. (transform_weather.py:141-142; SURVEY.md §7.4.3)
    */
  def broundAll(df: DataFrame, scale: Int, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> bround(col(c), scale)).toMap)

  /** P3 — add any missing columns as typed nulls (materialize_dim_market.py:21-25). */
  def withMissingAsNull(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    cols.foldLeft(df) { case (d, (name, tpe)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, lit(null).cast(tpe))
    }

  /** P6 — boolean predicate → 0/1 flag column (transform_weather.py:116-122). */
  def flag(pred: Column): Column = when(pred, 1L).otherwise(0L)
}
