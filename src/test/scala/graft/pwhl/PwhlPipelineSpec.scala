package graft.pwhl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Golden end-to-end: run the Spark pipeline over the reference's RAW
  * inputs and config, then compare stage outputs against the reference's
  * own checked-in cleaned artifacts (the CSVs under data/cleaned/ —
  * reproducible golden files per SURVEY §5) and README aggregates.
  * Tolerance: exact on strings/dates/longs, 1e-9 relative on doubles
  * (pandas and Spark sum in different orders; values here are either
  * exactly representable or compared post-rounding).
  */
class PwhlPipelineSpec extends SparkSpec {

  private val ref = "/root/reference"
  private lazy val outDir = {
    val d = Files.createTempDirectory("pwhl_e2e_").toFile.getAbsolutePath
    val timings = new Pipeline(
      spark,
      rawTicketsCsv = s"$ref/data/raw/pwhl_ticket_sales.csv",
      rawCapacityCsv = s"$ref/data/raw/game_section_capacity.csv",
      rawWeatherGlob = s"$ref/data/raw/weather/weather_hourly_*.csv",
      marketsYml = s"$ref/config/markets.yml",
      outDir = d,
      settingsYml = Some(s"$ref/config/settings.yml")).run()
    assert(timings.nonEmpty && timings.forall(_.seconds > 0))
    d
  }

  private def readOut(name: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(s"$outDir/cleaned/$name")

  private def readGolden(path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Row-by-row compare after sorting both sides by `keys`.
    *
    * Doubles compare at 1e-9 relative, with one narrowly-scoped escape:
    * a one-cent disagreement whose midpoint lies exactly on a half-cent
    * (.xx5) boundary. Those groups' exact means ARE the boundary (e.g.
    * -83/40 = -2.075): our engine rounds them half-even from the exact
    * decimal mean, while pandas rounds whatever side its float-accumulated
    * noise landed on — measured: 7 of 1888 golden values, all exactly on
    * the boundary, split in both directions. Anything else fails.
    */
  private def assertMatches(got: DataFrame, want: DataFrame, keys: Seq[String],
                            tol: Double = 1e-9, maxBoundary: Int = 10): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq,
      s"columns differ: ${got.columns.toSeq} vs ${want.columns.toSeq}")
    val g = got.orderBy(keys.map(col): _*).collect()
    val w = want.orderBy(keys.map(col): _*).collect()
    assert(g.length == w.length, s"row counts differ: ${g.length} vs ${w.length}")
    val cols = got.columns
    var boundaryHits = 0
    g.zip(w).zipWithIndex.foreach { case ((gr, wr), i) =>
      cols.indices.foreach { c =>
        (gr.get(c), wr.get(c)) match {
          case (null, null) =>
          case (a: java.lang.Double, b: java.lang.Double) =>
            val scale = math.max(1.0, math.abs(b))
            val halfCentBoundary = {
              val mid = (a + b) / 2 * 1000.0
              math.abs(a - b) <= 0.01 + 1e-9 &&
                math.abs(mid - math.rint(mid)) < 1e-6 &&
                math.abs(math.rint(mid)) % 10 == 5
            }
            if (math.abs(a - b) > tol * scale) {
              assert(halfCentBoundary, s"row $i col ${cols(c)}: $a != $b")
              boundaryHits += 1
            }
          case (a, b) =>
            assert(a == b, s"row $i col ${cols(c)}: $a != $b")
        }
      }
    }
    assert(boundaryHits <= maxBoundary,
      s"$boundaryHits half-cent boundary disagreements (max $maxBoundary)")
  }

  test("preflight aborts before any job when an input is missing") {
    val e = intercept[graft.ops.Validate.ValidationException] {
      new Pipeline(spark,
        rawTicketsCsv = "/nonexistent/tickets.csv",
        rawCapacityCsv = s"$ref/data/raw/game_section_capacity.csv",
        rawWeatherGlob = s"$ref/data/raw/weather/weather_hourly_*.csv",
        marketsYml = s"$ref/config/markets.yml",
        outDir = java.nio.file.Files.createTempDirectory("pf_").toString).run()
    }
    assert(e.getMessage.contains("raw ticket sales"))
    assert(e.getMessage.contains("/nonexistent/tickets.csv"))
  }

  test("dim_market matches the reference's materialized dimension") {
    val schema = StructType(Seq(
      StructField("venue_id", StringType), StructField("market", StringType),
      StructField("venue", StringType), StructField("country", StringType),
      StructField("lat", DoubleType), StructField("lon", DoubleType),
      StructField("timezone", StringType)))
    assertMatches(
      readOut("dim_market", schema),
      readGolden(s"$ref/data/cleaned/dim_market.csv", schema),
      keys = Seq("venue_id"))
  }

  test("ticket integrity gate: total_spend == price x quantity holds on reference data") {
    val base = Stages.cleanTicketsBase(
      Stages.readCsv(spark, s"$ref/data/raw/pwhl_ticket_sales.csv", RawSchemas.ticketSales),
      Stages.readCsv(spark, s"$ref/data/raw/game_section_capacity.csv", RawSchemas.sectionCapacity))
    assert(Stages.ticketIntegrityViolations(base) == 0L)
  }

  test("hourly tidy weather matches the reference row count and grain") {
    val got = readOut("weather_hourly_tidy", RawSchemas.weatherHourlyTidy)
    assert(got.count() == 11328L) // 8 markets x 59 days x 24 h
    // grain is unique on (venue_id, time)
    assert(got.groupBy("venue_id", "time").count().filter(col("count") > 1).isEmpty)
    // enrichment matched every row (country never fell back to "")
    assert(got.filter(col("country") === "" || col("venue_id").rlike("^[a-z]")).isEmpty)
  }

  test("daily weather rollup matches the reference golden file") {
    assertMatches(
      readOut("weather_daily_by_venue", RawSchemas.weatherDaily),
      readGolden(s"$ref/data/cleaned/weather_daily_by_venue.csv", RawSchemas.weatherDaily),
      keys = Seq("event_date", "market", "venue_id"))
  }

  test("cleaned capacity (x8 market replication) matches the reference golden file") {
    assertMatches(
      readOut("section_capacity_clean", RawSchemas.sectionCapacityClean),
      readGolden(s"$ref/data/cleaned/section_capacity_clean.csv", RawSchemas.sectionCapacityClean),
      keys = Seq("event_date", "market", "section"))
  }

  test("integrated fact matches the reference golden file (600 rows, 20 cols)") {
    val factSchema = StructType(Seq(
      StructField("event_date", DateType), StructField("market", StringType),
      StructField("venue_id", StringType), StructField("venue", StringType),
      StructField("section", StringType), StructField("tickets_sold", LongType),
      StructField("revenue", DoubleType), StructField("avg_price", DoubleType),
      StructField("section_capacity", LongType), StructField("utilization", DoubleType),
      StructField("avg_temp_c", DoubleType), StructField("min_temp_c", DoubleType),
      StructField("max_temp_c", DoubleType), StructField("avg_rh_pct", DoubleType),
      StructField("avg_wind_mps", DoubleType), StructField("total_precip_mm", DoubleType),
      StructField("windy_hours", LongType), StructField("rainy_hours", LongType),
      StructField("freezing_hours", LongType), StructField("hours_observed", LongType)))
    val got = readOut("fact_ticket_sales_with_weather", factSchema)
    val want = readGolden(s"$ref/data/cleaned/fact_ticket_sales_with_weather.csv", factSchema)
    assertMatches(got, want, keys = Seq("event_date", "market", "section"))
    assert(got.count() == 600L)
  }

  test("README published aggregates reproduce (avg utilization ~0.597)") {
    val fact = readOut("fact_ticket_sales_with_weather", StructType(Seq(
      StructField("event_date", DateType), StructField("market", StringType),
      StructField("venue_id", StringType), StructField("venue", StringType),
      StructField("section", StringType), StructField("tickets_sold", LongType),
      StructField("revenue", DoubleType), StructField("avg_price", DoubleType),
      StructField("section_capacity", LongType), StructField("utilization", DoubleType),
      StructField("avg_temp_c", DoubleType), StructField("min_temp_c", DoubleType),
      StructField("max_temp_c", DoubleType), StructField("avg_rh_pct", DoubleType),
      StructField("avg_wind_mps", DoubleType), StructField("total_precip_mm", DoubleType),
      StructField("windy_hours", LongType), StructField("rainy_hours", LongType),
      StructField("freezing_hours", LongType), StructField("hours_observed", LongType))))
    val avgUtil = fact.agg(avg("utilization")).head().getDouble(0)
    assert(math.abs(avgUtil - 0.597) < 0.0005, s"avg utilization $avgUtil") // README.md:297
    // README.md:311 publishes "Upper Bowl: 15,346,680 | 75.47" — the golden
    // fact itself sums to 15,364,680 (README transposed two digits), and
    // 75.47 is the mean of the per-group avg_price column (mean-of-means),
    // not revenue/tickets (SURVEY §7.4.5 — two quantities, same name).
    val upper = fact.filter(col("section") === "Upper Bowl")
      .agg(sum("revenue").as("rev"), avg("avg_price").as("app"))
      .head()
    assert(math.abs(upper.getDouble(0) - 1.536468e7) < 1.0, s"upper bowl revenue ${upper.getDouble(0)}")
    assert(math.abs(upper.getDouble(1) - 75.47) < 0.005, s"upper bowl avg price ${upper.getDouble(1)}")
  }

  test("warehouse fact layout prunes on event_date partitions") {
    val wh = spark.read.parquet(s"$outDir/warehouse/fact_ticket_sales_with_weather")
    val pruned = wh.filter(col("event_date") === "2025-01-01")
    assert(pruned.count() == 40L) // 8 markets x 5 sections
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"))
  }

  test("X3 run-log artifact: one line per stage under the configured name") {
    outDir // force the pipeline run
    // log name comes from settings.weather.log_file's basename
    val log = new java.io.File(s"$outDir/logs/ingest_weather.log")
    assert(log.isFile, s"run log missing at $log")
    val lines = scala.io.Source.fromFile(log, "UTF-8").getLines().toSeq
    val stages = Seq("materialize_dim_market", "transform_weather.hourly",
      "transform_weather.daily", "clean_ticket_sales", "clean_section_capacity",
      "integrate_weather_sales")
    stages.foreach { st =>
      assert(lines.exists(l => l.contains(s"stage=$st") && l.contains("| INFO |")),
        s"no log line for stage $st in:\n${lines.mkString("\n")}")
    }
    assert(lines.last.contains("pipeline complete"))
  }

  test("settings date window bounds the weather actually ingested") {
    // narrow the window to January; the February hourly rows in the raw
    // fixture must not reach the daily rollup (the fetch-window contract,
    // ingest_weather.py:37-44, replayed as a filter over the fixture)
    val narrow = java.nio.file.Files.createTempFile("settings_narrow_", ".yml")
    val refText = scala.io.Source.fromFile(s"$ref/config/settings.yml", "UTF-8").mkString
    java.nio.file.Files.write(narrow,
      refText.replace("\"2025-02-28\"", "\"2025-01-31\"").getBytes("UTF-8"))
    val d = Files.createTempDirectory("pwhl_window_").toFile.getAbsolutePath
    new Pipeline(spark,
      rawTicketsCsv = s"$ref/data/raw/pwhl_ticket_sales.csv",
      rawCapacityCsv = s"$ref/data/raw/game_section_capacity.csv",
      rawWeatherGlob = s"$ref/data/raw/weather/weather_hourly_*.csv",
      marketsYml = s"$ref/config/markets.yml",
      outDir = d,
      settingsYml = Some(narrow.toString)).run()
    val daily = spark.read.option("header", "true")
      .schema(RawSchemas.weatherDaily)
      .csv(s"$d/cleaned/weather_daily_by_venue")
    assert(daily.count() > 0)
    assert(daily.filter(col("event_date") > "2025-01-31").count() == 0L,
      "out-of-window days must not survive the ingest window")
    // the full-window run (outDir) keeps February
    val full = spark.read.option("header", "true")
      .schema(RawSchemas.weatherDaily)
      .csv(s"$outDir/cleaned/weather_daily_by_venue")
    assert(full.filter(col("event_date") > "2025-01-31").count() > 0L)
  }
}
