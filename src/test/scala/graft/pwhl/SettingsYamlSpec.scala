package graft.pwhl

import graft.SparkSpec
import graft.sources.WeatherFetch

class SettingsYamlSpec extends SparkSpec {

  private val ref = "/root/reference"
  private def env(name: String): Option[String] =
    if (name == "BQ_PROJECT_ID") Some("test-project-123") else None

  test("parses the reference settings.yml into the typed config") {
    val s = SettingsYaml.settings(s"$ref/config/settings.yml", env)
    assert(s.weather.provider == "open-meteo-era5")
    assert(s.weather.startDate == "2025-01-01" && s.weather.endDate == "2025-02-28")
    assert(s.weather.hourly ==
      "temperature_2m,relative_humidity_2m,wind_speed_10m,precipitation")
    assert(s.weather.baseUrl == "https://archive-api.open-meteo.com/v1/era5")
    assert(s.weather.timeoutSeconds == 60)
    assert(s.weather.logFile == "logs/ingest_weather.log")
    assert(s.warehouse.projectId == "test-project-123", "placeholder must resolve via env")
    assert(s.warehouse.datasetId == "pwhl_takehome")
    assert(s.warehouse.tableId == "fact_ticket_sales_with_weather")
    assert(s.warehouse.writeDisposition == "WRITE_TRUNCATE")
  }

  test("single-quoted values keep '#' and top-level scalars after a section are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("settings").toFile
    val ok = new java.io.File(dir, "ok.yml")
    java.nio.file.Files.write(ok.toPath,
      """weather:
        |  log_file: 'a#b.log'   # comment after a single-quoted hash
        |  out_csv: "c#d.csv"    # and after a double-quoted one
        |""".stripMargin.getBytes("UTF-8"))
    val m = SettingsYaml.parseSections(ok.getPath)("weather")
    assert(m("log_file") == "a#b.log", s"got ${m("log_file")}")
    assert(m("out_csv") == "c#d.csv", s"got ${m("out_csv")}")

    val bad = new java.io.File(dir, "bad.yml")
    java.nio.file.Files.write(bad.toPath,
      """weather:
        |  provider: x
        |stray_key: value
        |""".stripMargin.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](SettingsYaml.parseSections(bad.getPath))
    assert(e.getMessage.contains("stray_key"),
      s"top-level scalar must fail loudly, not join 'weather': ${e.getMessage}")
  }

  test("unset placeholder and missing keys fail loudly at load") {
    val e = intercept[graft.ops.Validate.ValidationException] {
      SettingsYaml.settings(s"$ref/config/settings.yml", _ => None)
    }
    assert(e.getMessage.contains("BQ_PROJECT_ID"))
  }

  test("urlFor reproduces the reference's request URL per market") {
    val s = SettingsYaml.settings(s"$ref/config/settings.yml", env)
    val markets = MarketsYaml.parse(s"$ref/config/markets.yml")
    val toronto = markets.find(_.market == "Toronto").get
    val url = WeatherFetch.urlFor(s.weather, toronto)
    // the exact query requests.get(base_url, params) sends: dict order,
    // quote_plus encoding (',' -> %2C, '/' -> %2F)
    assert(url ==
      "https://archive-api.open-meteo.com/v1/era5" +
        s"?latitude=${toronto.lat.get}&longitude=${toronto.lon.get}" +
        "&start_date=2025-01-01&end_date=2025-02-28" +
        "&hourly=temperature_2m%2Crelative_humidity_2m%2Cwind_speed_10m%2Cprecipitation" +
        "&timezone=" + toronto.timezone.replace("/", "%2F"))
    // every market with coordinates builds a distinct URL; missing
    // coordinates are a config error, not a malformed request
    val urls = markets.filter(m => m.lat.isDefined && m.lon.isDefined)
      .map(WeatherFetch.urlFor(s.weather, _))
    assert(urls.distinct.length == urls.length)
  }

  test("ingestHourly isolates fetch failures per market") {
    val s = SettingsYaml.settings(s"$ref/config/settings.yml", env)
    val markets = MarketsYaml.parse(s"$ref/config/markets.yml").take(2)
    val goodJson =
      """{"hourly": {"time": ["2025-01-01T00:00"], "temperature_2m": [1.5],
        |"relative_humidity_2m": [80.0], "wind_speed_10m": [3.0], "precipitation": [0.0]}}""".stripMargin
    val provider = WeatherFetch.FixturePayloads(Map(markets.head.market -> goodJson))
    val (rows, bad) = WeatherFetch.ingestHourly(spark, s.weather, markets, provider)
    assert(rows.count() == 1L, "the good market's rows must survive")
    assert(bad.length == 1 && bad.head.startsWith(markets(1).market),
      s"the missing market must be reported: $bad")
  }

  test("settings window drives the dim_date spine") {
    import java.nio.file.Files
    // same schema as the reference file, narrower window
    val narrow = Files.createTempFile("settings_", ".yml")
    Files.write(narrow,
      """weather:
        |  provider: open-meteo-era5
        |  start_date: "2025-01-01"
        |  end_date: "2025-01-10"
        |  hourly: "temperature_2m"
        |  base_url: "https://example.invalid/v1"
        |  timeout_seconds: 5
        |  out_csv: "data/raw/weather/w.csv"
        |  log_file: "logs/ingest.log"
        |
        |bigquery:
        |  project_id: "p"
        |  dataset_id: "d"
        |  location: "US"
        |  table_id: "fact_ticket_sales_with_weather"
        |  write_disposition: "WRITE_TRUNCATE"
        |  source_csv: "data/cleaned/f.csv"
        |""".stripMargin.getBytes("UTF-8"))
    val s = SettingsYaml.settings(narrow.toString)
    StarSchema.registerDateSpine(spark, s.weather.startDate, s.weather.endDate)
    assert(spark.table("dim_date").count() == 10L,
      "spine must span exactly the configured window")
    assert(spark.sql("SELECT min(date_key), max(date_key) FROM dim_date")
      .collect().head.toSeq.map(_.toString) == Seq("2025-01-01", "2025-01-10"))
    // the settings-driven default window reproduces the reference's
    // hard-coded spine (59 days, sql/02:57-65)
    val refS = SettingsYaml.settings(s"$ref/config/settings.yml", env)
    StarSchema.registerDateSpine(spark, refS.weather.startDate, refS.weather.endDate)
    assert(spark.table("dim_date").count() == 59L)
    // malformed window is a config error before any SQL runs
    intercept[java.time.format.DateTimeParseException] {
      StarSchema.registerDateSpine(spark, "not-a-date", "2025-01-10")
    }
  }
}
