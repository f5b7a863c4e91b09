package graft.pwhl

import org.apache.spark.sql.types._

/** Explicit read schemas for the reference's raw/cleaned CSV surfaces
  * (S1/S2) — supplied up front so the reader never needs an inferSchema
  * double-pass over the data (SURVEY §2.1). Date-bearing columns land as
  * STRING and go through Cleaning.parseDateMulti, because raw files carry
  * `M/d/yyyy` while re-read cleaned files carry ISO (SURVEY §7.4.2) — a
  * fixed dateFormat read option could not serve both.
  */
object RawSchemas {

  /** data/raw/pwhl_ticket_sales.csv (clean_ticket_sales.py:75-95). Numeric
    * columns as STRING + coerce: pd.to_numeric(errors="coerce") maps junk
    * to null, while a typed CSV reader would null silently per its own
    * rules — going through try_cast keeps one coercion semantic.
    */
  val ticketSales: StructType = StructType(Seq(
    StructField("event_date", StringType),
    StructField("section", StringType),
    StructField("row", StringType),
    StructField("seat", StringType),
    StructField("ticket_price", StringType),
    StructField("purchase_channel", StringType),
    StructField("acct_id", StringType),
    StructField("num_tickets", StringType),
    StructField("total_spend", StringType)))

  /** data/raw/game_section_capacity.csv (clean_section_capacity.py:83-95). */
  val sectionCapacity: StructType = StructType(Seq(
    StructField("event_date", StringType),
    StructField("section", StringType),
    StructField("section_capacity", StringType)))

  /** data/raw/weather/weather_hourly_*.csv (transform_weather.py:64-87). */
  val weatherHourly: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("temperature_2m", StringType),
    StructField("relative_humidity_2m", StringType),
    StructField("wind_speed_10m", StringType),
    StructField("precipitation", StringType),
    StructField("market", StringType),
    StructField("venue", StringType)))

  /** Cleaned per-market sales files re-read by the integrate stage
    * (integrate_weather_sales.py:57-66): base ticket columns + capacity +
    * market stamp.
    */
  val ticketSalesClean: StructType = StructType(Seq(
    StructField("event_date", StringType),
    StructField("section", StringType),
    StructField("row", DoubleType),
    StructField("seat", DoubleType),
    StructField("ticket_price", DoubleType),
    StructField("purchase_channel", StringType),
    StructField("acct_id", StringType),
    StructField("num_tickets", DoubleType),
    StructField("total_spend", DoubleType),
    StructField("section_capacity", DoubleType),
    StructField("venue_id", StringType),
    StructField("market", StringType),
    StructField("venue", StringType)))

  /** Per-market cleaned sales files written with partitionBy(venue_id) —
    * the partition column lives in the directory name, not the file, and
    * is restored by partition discovery (S3 glob re-read).
    */
  val ticketSalesCleanPartitioned: StructType = StructType(
    ticketSalesClean.fields.filterNot(_.name == "venue_id"))

  /** Cleaned hourly tidy weather re-read by the daily rollup. */
  val weatherHourlyTidy: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("event_date", DateType),
    StructField("market", StringType),
    StructField("country", StringType),
    StructField("venue_id", StringType),
    StructField("venue", StringType),
    StructField("temp_c", DoubleType),
    StructField("rh_pct", DoubleType),
    StructField("wind_mps", DoubleType),
    StructField("precip_mm", DoubleType)))

  val sectionCapacityClean: StructType = StructType(Seq(
    StructField("event_date", StringType),
    StructField("market", StringType),
    StructField("venue_id", StringType),
    StructField("venue", StringType),
    StructField("section", StringType),
    StructField("section_capacity", DoubleType)))

  val weatherDaily: StructType = StructType(Seq(
    StructField("event_date", StringType),
    StructField("market", StringType),
    StructField("country", StringType),
    StructField("venue_id", StringType),
    StructField("venue", StringType),
    StructField("avg_temp_c", DoubleType),
    StructField("min_temp_c", DoubleType),
    StructField("max_temp_c", DoubleType),
    StructField("avg_rh_pct", DoubleType),
    StructField("avg_wind_mps", DoubleType),
    StructField("total_precip_mm", DoubleType),
    StructField("windy_hours", LongType),
    StructField("rainy_hours", LongType),
    StructField("freezing_hours", LongType),
    StructField("hours_observed", LongType)))
}
