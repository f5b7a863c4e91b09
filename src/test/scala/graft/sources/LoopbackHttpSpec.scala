package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** The connectors against a REAL socket (round-16 verdict item 5): a
  * `com.sun.net.httpserver` loopback serves the SAME fixture bytes the
  * file transport reads, proving the "fixture envelopes ≡ API bytes"
  * claim and the one-function seam swap ([[Http.readBytes]]) — plus the
  * paths a fixture can never exercise: 5xx with retry, fail-fast 4xx,
  * read timeouts, and per-market / per-page isolation of a live 500.
  * Zero new dependencies: the server ships in the JDK.
  */
class LoopbackHttpSpec extends SparkSpec {

  // ---- loopback service: serves a backing dir, with fault injection ----

  /** per-path GET counters (pushdown proofs read these) */
  private val hits = TrieMap.empty[String, AtomicInteger]
  /** per-path injected behavior: Left(code) = error response,
    * Right(ms) = sleep before serving (timeout injection) */
  private val faults = TrieMap.empty[String, Either[Int, Long]]
  /** one-shot faults: consumed on first hit (retry-success proofs) */
  private val oneShot = TrieMap.empty[String, Int]

  private var server: HttpServer = _
  private var root: String = _
  private def base: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft_http_root_").toString
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      hits.getOrElseUpdate(path, new AtomicInteger).incrementAndGet()
      oneShot.remove(path) match {
        case Some(code) => respond(x, code, "injected one-shot fault")
        case None => faults.get(path) match {
          case Some(Left(code)) => respond(x, code, "injected fault")
          case other =>
            other.foreach { case Right(ms) => Thread.sleep(ms); case _ => }
            val f = Paths.get(root, path)
            if (Files.exists(f)) {
              val b = Files.readAllBytes(f)
              x.sendResponseHeaders(200, b.length.toLong)
              x.getResponseBody.write(b)
              x.close()
            } else respond(x, 404, "no such fixture")
        }
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def respond(x: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, b.length.toLong)
    x.getResponseBody.write(b)
    x.close()
  }

  private def put(path: String, body: String): Unit = {
    val p = Paths.get(root, path)
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
  }

  private def nHits(path: String): Int =
    hits.get(path).map(_.get()).getOrElse(0)

  // ---- the raw transport ----

  test("Http.get: 200 body round-trips; 404 fails FAST (no retry); a " +
    "one-shot 500 is retried to success; a persistent 500 exhausts retries") {
    put("/t/ok.json", """{"a": 1}""")
    assert(new String(Http.get(s"$base/t/ok.json").toOption.get,
      StandardCharsets.UTF_8) == """{"a": 1}""")

    val r404 = Http.get(s"$base/t/missing.json", retries = 3)
    assert(r404.isLeft && r404.left.toOption.get.permanent)
    assert(nHits("/t/missing.json") == 1, "4xx must not be retried")

    put("/t/flaky.json", "recovered")
    oneShot.put("/t/flaky.json", 500)
    val rFlaky = Http.get(s"$base/t/flaky.json", retries = 2)
    assert(new String(rFlaky.toOption.get, StandardCharsets.UTF_8) == "recovered")
    assert(nHits("/t/flaky.json") == 2, "one 500, one successful retry")

    put("/t/down.json", "never served")
    faults.put("/t/down.json", Left(503))
    val rDown = Http.get(s"$base/t/down.json", retries = 2, backoffMs = 1)
    assert(rDown.isLeft && !rDown.left.toOption.get.permanent)
    assert(nHits("/t/down.json") == 3, "initial attempt + 2 retries")
    faults.remove("/t/down.json")
  }

  test("Http.get: a read timeout is transient — retried, then reported") {
    put("/t/slow.json", "eventually")
    faults.put("/t/slow.json", Right(500L)) // server sleeps 500 ms
    val r = Http.get(s"$base/t/slow.json",
      readTimeoutMs = 50, retries = 1, backoffMs = 1)
    assert(r.isLeft && !r.left.toOption.get.permanent)
    assert(r.left.toOption.get.message.contains("timeout"))
    assert(nHits("/t/slow.json") == 2)
    faults.remove("/t/slow.json")
  }

  // ---- graft-weather over the wire ----

  private val marketsYml = "/root/reference/config/markets.yml"

  private def weatherPayload(tag: Int): String =
    s"""{"hourly": {"time": ["2024-01-0${tag}T00:00", "2024-01-0${tag}T01:00"],
       |"temperature_2m": [${tag}.5, ${tag}.25],
       |"relative_humidity_2m": [40.0, 4${tag}.0],
       |"wind_speed_10m": [${tag}.0, 1${tag}.0],
       |"precipitation": [0.0, 0.${tag}]}}""".stripMargin

  test("graft-weather scans localhost HTTP: parity with the file " +
    "transport; a 500 market is isolated; strict mode raises it") {
    val markets = graft.pwhl.MarketsYaml.parse(marketsYml)
    val fileDir = Files.createTempDirectory("graft_w_file_").toString
    markets.zipWithIndex.foreach { case (m, i) =>
      val body = weatherPayload(i % 9)
      put(s"/weather/${m.market}.json", body)
      Files.write(Paths.get(s"$fileDir/${m.market}.json"),
        body.getBytes(StandardCharsets.UTF_8))
    }
    def scan(payloads: String, strict: Boolean = false) =
      spark.read.format("graft-weather")
        .option("payloads", payloads).option("markets", marketsYml)
        .option("strict", strict.toString).load()
    val viaHttp = scan(s"$base/weather").collect().toSet
    val viaFile = scan(fileDir).collect().toSet
    assert(viaHttp == viaFile, "API bytes ≡ fixture bytes, same rows")
    assert(viaHttp.nonEmpty)

    // one market's endpoint 500s: that market contributes zero rows,
    // every other market is untouched (the reference's isolation,
    // ingest_weather.py:79-97, now across a real socket)
    val down = markets.head.market
    faults.put(s"/weather/$down.json", Left(500))
    val degraded = scan(s"$base/weather").collect().toSet
    assert(degraded == viaFile.filterNot(_.getString(5) == down))
    assert(degraded.nonEmpty)
    // strict mode: the same 500 fails the scan loudly
    val e = intercept[org.apache.spark.SparkException] {
      scan(s"$base/weather", strict = true).collect()
    }
    assert(e.getMessage != null)
    faults.remove(s"/weather/$down.json")
  }

  test("WeatherFetch.HttpPayloads drives urlFor against a live socket " +
    "with per-market isolation") {
    import graft.pwhl.SettingsYaml.WeatherSettings
    val markets = graft.pwhl.MarketsYaml.parse(marketsYml).take(3)
    // the provider GETs urlFor(...) verbatim: serve the exact path+query
    // by materializing one payload per market under a query-keyed route
    val settings = WeatherSettings(
      provider = "loopback", startDate = "2024-01-01",
      endDate = "2024-01-02", hourly = "temperature_2m",
      baseUrl = s"$base/v1/forecast", timeoutSeconds = 5,
      outCsv = "/tmp/unused.csv", logFile = "/tmp/unused.log")
    // the loopback handler keys on PATH only; assert the query string
    // reached the server by routing through a capturing context instead
    val captured = TrieMap.empty[String, String]
    server.createContext("/v1/forecast", (x: HttpExchange) => {
      val q = x.getRequestURI.getRawQuery
      val lat = q.split("&").find(_.startsWith("latitude=")).get
        .stripPrefix("latitude=")
      captured.put(lat, q)
      val m = markets.find(_.lat.exists(_.toString == lat))
      if (m.exists(_.market == markets(1).market))
        respond(x, 500, "market service down")
      else respond(x, 200, weatherPayload(1))
    })
    val (rows, failed) = WeatherFetch.ingestHourly(spark, settings, markets,
      WeatherFetch.HttpPayloads(retries = 0))
    assert(failed.size == 1 && failed.head.startsWith(markets(1).market),
      s"exactly the 500 market fails: $failed")
    assert(rows.select("market").distinct().count() == 2)
    // the reference's exact query params crossed the wire (timezone is
    // per-market and quote_plus-encoded, e.g. America%2FToronto)
    assert(captured.size == markets.size)
    assert(captured.values.forall(q => q.contains("start_date=2024-01-01")
      && q.contains("hourly=temperature_2m") && q.contains("timezone=")))
    assert(captured.values.exists(_.contains("%2F")),
      "quote_plus encoding ('/' -> %2F) must survive the wire untouched")
    server.removeContext("/v1/forecast")
  }

  // ---- graft-rest over the wire ----

  private def writeRestPages(sub: String, total: Int, pageSize: Int): Unit = {
    val nPages = math.max(1, (total + pageSize - 1) / pageSize)
    (0 until nPages).foreach { pg =>
      val items = (pg * pageSize until math.min(total, (pg + 1) * pageSize))
        .map(i => s"""{"id": $i, "name": "n$i", "value": ${i / 2.0}}""")
        .mkString("[", ", ", "]")
      put(s"/$sub/page-$pg.json",
        s"""{"total": $total, "page_size": $pageSize, "items": $items}""")
    }
  }

  test("graft-rest scans localhost HTTP: full parity, limit pushdown " +
    "fetches ONLY the needed page prefix, a 500 page is isolated") {
    writeRestPages("rest/c1", total = 23, pageSize = 5)
    import spark.implicits._
    def scan(opts: (String, String)*) = {
      val r = spark.read.format("graft-rest")
        .option("pages", s"$base/rest/c1")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
    }
    val got = scan().as[(Long, String, Double, Int)].collect().toSet
    assert(got == (0 until 23).map(i => (i.toLong, s"n$i", i / 2.0, i / 5)).toSet)

    // limit pushdown across the wire: pages 2..4 are never requested
    val before = (0 until 5).map(p => nHits(s"/rest/c1/page-$p.json"))
    assert(scan().limit(7).collect().length == 7)
    val after = (0 until 5).map(p => nHits(s"/rest/c1/page-$p.json"))
    assert(after(0) > before(0) && after(1) > before(1),
      "limit 7 at page_size 5 needs pages 0 and 1")
    assert((2 until 5).forall(p => after(p) == before(p)),
      "pages beyond the pushed limit must never be GET")

    // a 500 page: isolated non-strict (its rows only), loud strict
    faults.put("/rest/c1/page-2.json", Left(500))
    val degraded = scan().as[(Long, String, Double, Int)].collect().toSet
    assert(degraded == got.filterNot(_._4 == 2))
    intercept[org.apache.spark.SparkException] {
      scan("strict" -> "true").collect()
    }
    faults.remove("/rest/c1/page-2.json")
  }

  test("2PC write publishes a collection the HTTP surface then serves: " +
    "write → read-back parity over localhost, history ledger included") {
    import spark.implicits._
    // the writer IS the service's storage engine: its staged-files +
    // atomic-rename publish lands in the service's backing dir, and the
    // HTTP surface serves the published collection — a reader over the
    // wire sees exactly what df.write committed, never a torn mix
    val dir = s"$root/rest/written"
    val df = (0 until 17).map(i => (i.toLong, s"w$i", i * 1.5)).toDF("id", "name", "value")
    df.write.format("graft-rest").option("pages", dir)
      .option("pageSize", "4").mode("overwrite").save()
    val viaHttp = spark.read.format("graft-rest")
      .option("pages", s"$base/rest/written").load()
      .select("id", "name", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(viaHttp == (0 until 17).map(i => (i.toLong, s"w$i", i * 1.5)).toSet)
    // meta probe rode HTTP (planning), and the history ledger serves too
    assert(nHits("/rest/written/meta.json") >= 1)
    val hist = spark.read.format("graft-rest").option("history", "true")
      .option("pages", s"$base/rest/written").load().collect()
    assert(hist.length == 1 && hist.head.getString(3) == "overwrite")
  }
}
