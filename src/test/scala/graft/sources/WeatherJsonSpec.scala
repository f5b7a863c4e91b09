package graft.sources

import graft.SparkSpec

class WeatherJsonSpec extends SparkSpec {

  private val goodBoston = WeatherJson.Payload("Boston", "PWHL Boston Arena",
    """{"hourly": {"time": ["2025-01-01T00:00", "2025-01-01T01:00"],
      |"temperature_2m": [5.0, 6.2], "relative_humidity_2m": [91, 88],
      |"wind_speed_10m": [16.6, 20.3], "precipitation": [0.0, 0.1]}}""".stripMargin)
  private val goodToronto = WeatherJson.Payload("Toronto", "PWHL Toronto Arena",
    """{"hourly": {"time": ["2025-01-01T00:00"], "temperature_2m": [-3.5],
      |"relative_humidity_2m": [70], "wind_speed_10m": [9.9],
      |"precipitation": [0.0]}}""".stripMargin)
  private val malformed = WeatherJson.Payload("Ottawa", "PWHL Ottawa Arena",
    """{"error": true, "reason": "rate limited""")

  test("columnar payloads pivot to tidy hourly rows with market stamping") {
    val (rows, failed) = WeatherJson.parseHourly(spark, Seq(goodBoston, goodToronto))
    assert(failed.isEmpty)
    val got = rows.orderBy("market", "time").collect()
    assert(got.length == 3)
    assert(got(0).getAs[String]("market") == "Boston")
    assert(got(0).getAs[Double]("temperature_2m") == 5.0)
    assert(got(2).getAs[String]("market") == "Toronto")
    assert(rows.columns.toSeq == Seq("time", "temperature_2m",
      "relative_humidity_2m", "wind_speed_10m", "precipitation", "market", "venue"))
  }

  test("a malformed payload fails only its own market (per-item isolation)") {
    val (rows, failed) = WeatherJson.parseHourly(spark, Seq(goodBoston, malformed, goodToronto))
    assert(failed == Seq("Ottawa"))
    assert(rows.count() == 3) // both good markets fully ingested
    assert(rows.filter(rows("market") === "Ottawa").isEmpty)
  }

  test("parsed rows feed the weather transform stage end to end") {
    val (rows, _) = WeatherJson.parseHourly(spark, Seq(goodBoston, goodToronto))
    val markets = graft.pwhl.MarketsYaml.markets(spark, "/root/reference/config/markets.yml")
    val tidy = graft.pwhl.Stages.weatherHourlyTidy(rows, markets)
    val got = tidy.collect()
    assert(got.length == 3)
    assert(got.forall(r => r.getAs[String]("venue_id").endsWith("_01"))) // enriched
  }
}
