package graft.pwhl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{Cleaning, Validate}

/** The reference pipeline's four transform stages (SURVEY §7.1 steps 4–7)
  * as pure `DataFrame => DataFrame` functions — one lazy Catalyst plan per
  * stage instead of eager pandas steps. Every dimension join is a
  * broadcast (8–600 rows); the only shuffles are the two aggregations
  * (hourly→daily, ticket→section-day), both with map-side partial
  * aggregation, and the deterministic output sorts the reference also
  * performs before every write (SURVEY §2.5 O1).
  *
  * Reference semantics replicated (cited per function):
  *   transform_weather.py, clean_ticket_sales.py,
  *   clean_section_capacity.py, integrate_weather_sales.py.
  */
object Stages {

  /** S1/S2 — header CSV scan with explicit schema (no inferSchema pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  private def parseDate(c: Column): Column = Cleaning.parseDateMulti(c)

  // --- Stage: weather transform (transform_weather.py:64-146) -------------

  /** Hourly tidy: parse time/event_date, rename API columns (F6), coerce
    * numerics (F7), broadcast-enrich from markets.yml with m:1 contract
    * (J1), slugify fallback for unmatched venues (F2/F11), fixed column
    * order + deterministic sort (P2/O1). transform_weather.py:74-107.
    */
  def weatherHourlyTidy(raw: DataFrame, markets: DataFrame): DataFrame = {
    Validate.requireColumns(raw,
      Set("time", "temperature_2m", "relative_humidity_2m", "wind_speed_10m",
        "precipitation", "market", "venue"), "weather raw")
    val mkts = Validate.assertM1(
      markets.select("market", "venue", "venue_id", "country"),
      Seq("market", "venue"), "markets.yml")
    raw
      .withColumn("time", try_to_timestamp(col("time")))
      .withColumn("event_date", to_date(col("time")))
      .withColumnsRenamed(Map(
        "temperature_2m" -> "temp_c",
        "relative_humidity_2m" -> "rh_pct",
        "wind_speed_10m" -> "wind_mps",
        "precipitation" -> "precip_mm"))
      .withColumns(Map(
        "temp_c" -> Cleaning.coerceDouble(col("temp_c")),
        "rh_pct" -> Cleaning.coerceDouble(col("rh_pct")),
        "wind_mps" -> Cleaning.coerceDouble(col("wind_mps")),
        "precip_mm" -> Cleaning.coerceDouble(col("precip_mm"))))
      .join(broadcast(mkts), Seq("market", "venue"), "left")
      .withColumn("venue_id",
        coalesce(col("venue_id"), Cleaning.slugify(col("market"), col("venue"))))
      .withColumn("country", coalesce(col("country"), lit("")))
      .select("time", "event_date", "market", "country", "venue_id", "venue",
        "temp_c", "rh_pct", "wind_mps", "precip_mm")
      .orderBy("market", "venue_id", "time")
  }

  /** Daily rollup: threshold flags (P6; null-safe — a null measurement is
    * not a windy/rainy/freezing hour, matching pandas NaN>=x == False),
    * 10-agg groupBy (A1), banker's rounding on the float block (F9 — NOT
    * round(); pandas round is half-even). transform_weather.py:116-142.
    *
    * Means and the precip sum accumulate in DECIMAL: the raw observations
    * have one decimal digit, so the decimal sum is exact and
    * order-independent — a double sum's low bits depend on partition
    * completion order, and daily means land exactly on .xx5 rounding
    * boundaries in this data (observed: -149.4/24 = -6.225), where one
    * ulp decides between -6.22 and -6.23.
    */
  def weatherDaily(hourly: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,10)")
    // exact-sum / count, quotient at decimal scale 10, THEN half-even to 2
    def meanB2(c: Column): Column = bround(sum(dec(c)) / count(c), 2).cast("double")
    hourly
      .withColumn("is_windy_hour", Cleaning.flag(col("wind_mps") >= 8.0))
      .withColumn("is_rainy_hour", Cleaning.flag(col("precip_mm") > 0.0))
      .withColumn("is_freezing_hour", Cleaning.flag(col("temp_c") <= 0.0))
      .groupBy("event_date", "market", "country", "venue_id", "venue")
      .agg(
        meanB2(col("temp_c")).as("avg_temp_c"),
        bround(min("temp_c"), 2).as("min_temp_c"),
        bround(max("temp_c"), 2).as("max_temp_c"),
        meanB2(col("rh_pct")).as("avg_rh_pct"),
        meanB2(col("wind_mps")).as("avg_wind_mps"),
        bround(sum(dec(col("precip_mm"))), 2).cast("double").as("total_precip_mm"),
        sum("is_windy_hour").as("windy_hours"),
        sum("is_rainy_hour").as("rainy_hours"),
        sum("is_freezing_hour").as("freezing_hours"),
        count("time").as("hours_observed"))
      .orderBy("event_date", "market", "venue_id")
  }

  // --- Stage: ticket sales clean (clean_ticket_sales.py:75-157) -----------

  /** Base clean: normalize headers (P1), parse dates (F4 — raw files carry
    * M/d/yyyy), canonicalize sections (F1), trim channels (F3), coerce
    * numerics (F7), then one m:1 broadcast join to per-(date, section)
    * capacity guarded by a duplicate-key abort (A10/J2).
    * clean_ticket_sales.py:91-128.
    */
  def cleanTicketsBase(ticketsRaw: DataFrame, capacityRaw: DataFrame): DataFrame = {
    val t0 = Cleaning.normalizeColumns(ticketsRaw)
    Validate.requireColumns(t0,
      Set("event_date", "section", "row", "seat", "ticket_price",
        "purchase_channel", "acct_id", "num_tickets", "total_spend"), "ticket sales")
    val tickets = t0
      .withColumn("event_date", parseDate(col("event_date")))
      .withColumn("section", Cleaning.normTitle(col("section")))
      .withColumn("purchase_channel", trim(col("purchase_channel")))
      .withColumns(Map(
        "row" -> Cleaning.coerceDouble(col("row")),
        "seat" -> Cleaning.coerceDouble(col("seat")),
        "ticket_price" -> Cleaning.coerceDouble(col("ticket_price")),
        "num_tickets" -> Cleaning.coerceDouble(col("num_tickets")),
        "total_spend" -> Cleaning.coerceDouble(col("total_spend"))))

    val c0 = Cleaning.normalizeColumns(capacityRaw)
    Validate.requireColumns(c0, Set("event_date", "section", "section_capacity"), "capacity")
    val cap = c0
      .withColumn("event_date", parseDate(col("event_date")))
      .withColumn("section", Cleaning.normTitle(col("section")))
      .withColumn("section_capacity", Cleaning.coerceDouble(col("section_capacity")))
      .select("event_date", "section", "section_capacity")
    Validate.assertUniqueKeys(cap, Seq("event_date", "section"), "capacity")

    tickets.join(broadcast(cap), Seq("event_date", "section"), "left")
      // restore the reference's column order: base ticket cols + capacity
      .select("event_date", "section", "row", "seat", "ticket_price",
        "purchase_channel", "acct_id", "num_tickets", "total_spend",
        "section_capacity")
  }

  /** Warn-only integrity gate (F8): rows where total_spend disagrees with
    * price × quantity, clean_ticket_sales.py:97-101. Separate action —
    * opt-in so bench plans stay single-action (X3 note in SURVEY §7.4.7).
    */
  def ticketIntegrityViolations(base: DataFrame): Long =
    Validate.integrityWarnCount(base, col("ticket_price") * col("num_tickets"), col("total_spend"))

  /** X4 — the reference's per-market Python loop (stamp venue_id/market/
    * venue, write 8 files, concat) is one cross join against the 8-row
    * registry: same rows, one distributed pass, and a partitionBy
    * (venue_id) write recovers the per-market file layout.
    * clean_ticket_sales.py:133-157 / J5 analog of its `__key` merge.
    */
  def stampMarkets(base: DataFrame, markets: DataFrame): DataFrame =
    base.crossJoin(broadcast(
      markets.select(col("venue_id"), col("market"), col("venue"))
        .filter(col("venue_id") =!= "" && col("market") =!= "" && col("venue") =!= "")))

  // --- Stage: capacity clean (clean_section_capacity.py:83-115) -----------

  /** Clean + replicate per market: type-clean the 75-row capacity file and
    * cross join it against the registry (the reference's dummy-key merge,
    * :105-108 — Spark has a real cross join). Output grain:
    * date × market × section.
    */
  def cleanCapacity(capacityRaw: DataFrame, markets: DataFrame): DataFrame = {
    val c0 = Cleaning.normalizeColumns(capacityRaw)
    Validate.requireColumns(c0, Set("event_date", "section", "section_capacity"), "capacity")
    c0
      .withColumn("event_date", parseDate(col("event_date")))
      .withColumn("section", Cleaning.normTitle(col("section")))
      .withColumn("section_capacity", Cleaning.coerceDouble(col("section_capacity")))
      .crossJoin(broadcast(markets.select("market", "venue_id", "venue")))
      .select("event_date", "market", "venue_id", "venue", "section", "section_capacity")
      .orderBy("event_date", "market", "venue_id", "section")
  }

  // --- Stage: integrate (integrate_weather_sales.py:57-168) ---------------

  /** Fact assembly: aggregate sales to section-day grain BEFORE joining
    * (the reference's manual push-agg-below-join — a semantic grain
    * choice, SURVEY §4), then 5-key m:1 capacity join (J3) with
    * duplicate-key guard, utilization ratio (A11), and 4-key m:1 daily
    * weather join (J4). `avg_price` is mean-of-prices, deliberately NOT
    * revenue/tickets (SURVEY §7.4.5). integrate_weather_sales.py:111-163.
    */
  def integrate(sales: DataFrame, capacity: DataFrame, weatherDaily: DataFrame): DataFrame = {
    val s = sales
      .withColumn("event_date", parseDate(col("event_date")))
      .withColumns(Map(
        "ticket_price" -> Cleaning.coerceDouble(col("ticket_price")),
        "total_spend" -> Cleaning.coerceDouble(col("total_spend")),
        "num_tickets" -> Cleaning.coerceLong(col("num_tickets"))))
    Validate.requireColumns(s,
      Set("event_date", "market", "venue_id", "venue", "section",
        "ticket_price", "num_tickets", "total_spend"), "sales")

    val salesSec = s
      .groupBy("event_date", "market", "venue_id", "venue", "section")
      .agg(
        sum("num_tickets").as("tickets_sold"),
        sum("total_spend").as("revenue"),
        avg("ticket_price").as("avg_price"))

    val capKeys = Seq("event_date", "market", "venue_id", "venue", "section")
    val cap = capacity
      .withColumn("event_date", parseDate(col("event_date")))
      .withColumn("section_capacity", Cleaning.coerceLong(col("section_capacity")))
      .select((capKeys :+ "section_capacity").map(col): _*)
    Validate.assertUniqueKeys(cap, capKeys, "capacity")

    val wxKeys = Seq("event_date", "market", "venue_id", "venue")
    val wx = weatherDaily
      .withColumn("event_date", parseDate(col("event_date")))
      .select((wxKeys ++ Seq("avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct",
        "avg_wind_mps", "total_precip_mm", "windy_hours", "rainy_hours",
        "freezing_hours", "hours_observed")).map(col): _*)

    salesSec
      .join(broadcast(cap), capKeys, "left")
      .withColumn("utilization", col("tickets_sold") / col("section_capacity"))
      .join(broadcast(wx), wxKeys, "left")
      .orderBy("event_date", "market", "venue_id", "section")
  }
}
