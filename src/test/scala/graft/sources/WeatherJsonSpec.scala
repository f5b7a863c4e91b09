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

  // ---- DataSourceV2 path: spark.read.format("graft-weather") ----

  private val marketsYml = "/root/reference/config/markets.yml"

  /** Fixture payload dir: one <market>.json per market in the registry,
    * with a deterministic per-market series; one market malformed, one
    * missing entirely (per-partition isolation).
    */
  private def writePayloads(skip: Set[String], breakMarket: Option[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_weather_v2_").toString
    val all = graft.pwhl.MarketsYaml.parse(marketsYml)
    all.filterNot(m => skip(m.market)).zipWithIndex.foreach { case (m, i) =>
      val json =
        if (breakMarket.contains(m.market)) """{"error": true, "reason": "rate limited""""
        else
          s"""{"hourly": {"time": ["2025-01-01T0$i:00", "2025-01-01T1$i:00"],
             |"temperature_2m": [${i}.5, ${i}.75], "relative_humidity_2m": [80, $i],
             |"wind_speed_10m": [10.25, 2$i], "precipitation": [0.0]}}""".stripMargin
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/${m.market}.json"),
        json.getBytes("UTF-8"))
    }
    dir
  }

  test("v2: one partition per market; rows match the DataFrame pivot exactly") {
    val dir = writePayloads(Set.empty, None)
    val v2 = spark.read.format("graft-weather")
      .option("payloads", dir).option("markets", marketsYml).load()
    assert(v2.schema == graft.sources.v2.WeatherV2.Schema)
    assert(v2.rdd.getNumPartitions == graft.pwhl.MarketsYaml.parse(marketsYml).length)
    // parity with the from_json + arrays_zip pivot over the same payloads
    val payloads = graft.pwhl.MarketsYaml.parse(marketsYml).map { m =>
      WeatherJson.Payload(m.market, m.venue, new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/${m.market}.json")),
        "UTF-8"))
    }
    val (viaDf, failed) = WeatherJson.parseHourly(spark, payloads)
    assert(failed.isEmpty)
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(v2.collect().map(key).sorted.toSeq == viaDf.collect().map(key).sorted.toSeq)
    // the short precipitation array null-pads (arrays_zip semantics)
    assert(v2.filter(v2("precipitation").isNull).count() ==
      graft.pwhl.MarketsYaml.parse(marketsYml).length)
  }

  test("v2: a missing or malformed payload fails only its own partition") {
    val all = graft.pwhl.MarketsYaml.parse(marketsYml)
    val dir = writePayloads(Set(all.head.market), Some(all.last.market))
    val v2 = spark.read.format("graft-weather")
      .option("payloads", dir).option("markets", marketsYml).load()
    val markets = v2.select("market").distinct()
      .collect().map(_.getString(0)).toSet
    assert(markets == all.map(_.market).toSet - all.head.market - all.last.market)
    // strict mode restores fail-fast
    val strict = spark.read.format("graft-weather")
      .option("payloads", dir).option("markets", marketsYml)
      .option("strict", "true").load()
    intercept[org.apache.spark.SparkException](strict.count())
  }

  test("v2: column pruning reaches the reader (pushed required schema)") {
    val dir = writePayloads(Set.empty, None)
    val v2 = spark.read.format("graft-weather")
      .option("payloads", dir).option("markets", marketsYml).load()
      .select("market", "temperature_2m")
    val scan = v2.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    // pruned schema keeps the TABLE schema's field order, not the
    // projection's — only membership matters
    assert(scan.schema.fieldNames.toSet == Set("market", "temperature_2m"),
      s"reader should materialize only the projected columns, got ${scan.schema}")
    assert(v2.collect().length > 0)
  }

  test("v2: ingest feeds the weather transform stage end to end") {
    val dir = writePayloads(Set.empty, None)
    val v2 = spark.read.format("graft-weather")
      .option("payloads", dir).option("markets", marketsYml).load()
    val markets = graft.pwhl.MarketsYaml.markets(spark, marketsYml)
    val tidy = graft.pwhl.Stages.weatherHourlyTidy(v2, markets)
    val got = tidy.collect()
    assert(got.length == graft.pwhl.MarketsYaml.parse(marketsYml).length * 2)
    assert(got.forall(r => r.getAs[String]("venue_id").nonEmpty))
  }
}
