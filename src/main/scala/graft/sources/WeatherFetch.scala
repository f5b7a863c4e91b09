package graft.sources

import graft.pwhl.MarketsYaml.Market
import graft.pwhl.SettingsYaml.WeatherSettings

/** S4 transport seam (round-3 verdict stretch item): the reference GETs
  * `base_url?latitude=..&longitude=..&start_date=..&end_date=..&hourly=..
  * &timezone=..` per market (ingest_weather.py:26-48). This container has
  * zero egress, so the TRANSPORT is abstract: [[PayloadProvider.fetch]]
  * returns the JSON body `requests.get(...).json()` would have, and
  * [[FixturePayloads]] is the injectable implementation tests and the
  * sandboxed pipeline use. URL CONSTRUCTION — the part of the contract
  * that is pure logic — is real and unit-tested against the reference's
  * query params ([[urlFor]]).
  */
object WeatherFetch {

  /** One market's payload: Right(json body) or Left(error message) — the
    * per-market failure isolation boundary (a failed market is logged and
    * skipped; the run continues, ingest_weather.py:93-97).
    */
  trait PayloadProvider {
    def fetch(settings: WeatherSettings, market: Market): Either[String, String]
  }

  /** Fixture-backed provider: payloads keyed by market name; a missing
    * key simulates the reference's per-market fetch failure.
    */
  final case class FixturePayloads(byMarket: Map[String, String]) extends PayloadProvider {
    def fetch(settings: WeatherSettings, market: Market): Either[String, String] =
      byMarket.get(market.market).toRight(s"no payload for market ${market.market}")
  }

  /** LIVE transport provider: GETs the exact [[urlFor]] URL through the
    * shared [[graft.sources.Http]] seam (timeouts, bounded retry on
    * 5xx, fail-fast 4xx) — `requests.get(url)` with the reference's
    * per-market isolation intact: a failed market becomes a Left on the
    * SAME boundary a missing fixture key does, and the run continues.
    * The loopback spec drives this against a real socket; a deployment
    * points `settings.baseUrl` at the real API and changes nothing
    * else. Timeouts come from `settings.timeoutSeconds` — the reference
    * passes `timeout_seconds` straight to `requests.get`
    * (ingest_weather.py:45,65), which applies it to BOTH connect and
    * read — so a deployment configuring `timeout_seconds: 30` gets 30 s
    * here too; the case-class fields are explicit overrides only. */
  final case class HttpPayloads(
      connectTimeoutMs: Option[Int] = None, readTimeoutMs: Option[Int] = None,
      retries: Int = 2) extends PayloadProvider {
    def fetch(settings: WeatherSettings, market: Market): Either[String, String] = {
      val ms = settings.timeoutSeconds * 1000
      Http.get(urlFor(settings, market),
          connectTimeoutMs.getOrElse(ms), readTimeoutMs.getOrElse(ms), retries)
        .left.map(e => e.message)
        .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The exact request URL the reference constructs: parameter order
    * matches the `params` dict (ingest_weather.py:37-44) and values are
    * form-encoded the way `requests` encodes them (quote_plus: ',' →
    * %2C, '/' → %2F, space → '+').
    */
  def urlFor(settings: WeatherSettings, market: Market): String = {
    def enc(v: String): String = java.net.URLEncoder.encode(v, "UTF-8")
    val lat = market.lat.getOrElse(
      throw graft.ops.Validate.ValidationException(s"market ${market.market} has no lat"))
    val lon = market.lon.getOrElse(
      throw graft.ops.Validate.ValidationException(s"market ${market.market} has no lon"))
    val params = Seq(
      "latitude" -> lat.toString,
      "longitude" -> lon.toString,
      "start_date" -> settings.startDate,
      "end_date" -> settings.endDate,
      "hourly" -> settings.hourly,
      "timezone" -> market.timezone)
    settings.baseUrl + "?" + params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** Fetch + parse every market through the provider: the Spark-side
    * columnar→row pivot is [[WeatherJson.parseHourly]]; markets whose
    * fetch OR parse fails are reported in `_2` without failing the run.
    */
  def ingestHourly(
      spark: org.apache.spark.sql.SparkSession,
      settings: WeatherSettings,
      markets: Seq[Market],
      provider: PayloadProvider): (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val (fetched, fetchFailed) = markets.partitionMap { m =>
      provider.fetch(settings, m) match {
        case Right(json) => Left(WeatherJson.Payload(m.market, m.venue, json))
        case Left(err) => Right(s"${m.market}: $err")
      }
    }
    val (rows, parseFailed) = WeatherJson.parseHourly(spark, fetched)
    (rows, fetchFailed ++ parseFailed)
  }
}
