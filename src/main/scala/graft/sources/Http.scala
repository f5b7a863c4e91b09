package graft.sources

/** The ONE HTTP transport behind every connector seam (round-17: the
  * "fixture envelopes ≡ API bytes" claim finally meets a socket).
  * `java.net.HttpURLConnection` only — zero new dependencies, which is
  * the point: swapping a connector from fixture files to live HTTP is
  * THIS function and nothing else (`WeatherV2`'s `open`, `PagedRestV2`'s
  * `readPage`/`probe`, `WeatherFetch.HttpPayloads`).
  *
  * Failure contract (what the fixture transport could never exercise):
  *   - connect/read TIMEOUTS and 5xx responses are transient — retried
  *     up to `retries` times with a linear backoff, then reported as
  *     Left so the caller's isolation boundary (market/page/partition)
  *     decides, exactly as it does for a malformed fixture file;
  *   - 4xx responses are PERMANENT (retrying a 404 is a bug) — reported
  *     immediately;
  *   - a Left NEVER throws: connectors translate it at their own
  *     isolation granularity (non-strict scans log-and-skip, strict
  *     scans raise).
  *
  * 100 TB posture: this runs executor-side, once per partition-sized
  * unit (market payload, page) — the driver never funnels bytes, and a
  * retry storm is bounded per partition, not per job.
  */
object Http {

  /** `permanent` = retrying cannot help (4xx / unreadable fixture);
    * `notFound` = the resource is ABSENT (HTTP 404 / missing fixture
    * file) — the one permanent case callers may legitimately fold to
    * "zero rows" (no ledger published yet, no meta endpoint). Every
    * other error must surface: an outage is not an empty collection. */
  final case class HttpError(
      message: String, permanent: Boolean, notFound: Boolean = false)

  /** GET `url` → Right(body bytes) | Left(error). Retries transient
    * failures (timeouts, 5xx, dropped connections) `retries` times with
    * `backoffMs`-stepped sleeps; 4xx fails fast. */
  def get(
      url: String,
      connectTimeoutMs: Int = 2000,
      readTimeoutMs: Int = 5000,
      retries: Int = 2,
      backoffMs: Int = 50): Either[HttpError, Array[Byte]] = {
    var attempt = 0
    var last: HttpError = null
    while (attempt <= retries) {
      if (attempt > 0) Thread.sleep(backoffMs.toLong * attempt)
      attempt += 1
      once(url, connectTimeoutMs, readTimeoutMs) match {
        case Right(b) => return Right(b)
        case Left(e) if e.permanent => return Left(e)
        case Left(e) => last = e
      }
    }
    Left(last)
  }

  private def once(
      url: String, connectTimeoutMs: Int, readTimeoutMs: Int)
      : Either[HttpError, Array[Byte]] = {
    var conn: java.net.HttpURLConnection = null
    try {
      // connectors derive URLs from fixture-style names ("New York.json");
      // a raw space is the one illegal-in-URI character those names carry,
      // and escaping ONLY it cannot double-encode an already-encoded URL
      // (urlFor's quote_plus query strings contain no raw spaces)
      conn = new java.net.URI(url.replace(" ", "%20")).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) Right(readAll(conn.getInputStream))
      else {
        // drain the error body so the connection is reusable
        val es = conn.getErrorStream
        if (es != null) { readAll(es); () }
        Left(HttpError(s"HTTP $code from $url",
          permanent = code >= 400 && code < 500, notFound = code == 404))
      }
    } catch {
      case e: java.net.SocketTimeoutException =>
        Left(HttpError(s"timeout on $url: ${e.getMessage}", permanent = false))
      case e: java.io.IOException =>
        Left(HttpError(s"transport error on $url: ${e.getMessage}",
          permanent = false))
    } finally {
      if (conn != null) conn.disconnect()
    }
  }

  private def readAll(in: java.io.InputStream): Array[Byte] =
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()

  /** Is this location an HTTP seam rather than a fixture path? The ONE
    * dispatch rule every connector uses, so "swap the transport" can
    * never mean different things in different readers. */
  def isHttp(location: String): Boolean =
    location.startsWith("http://") || location.startsWith("https://")

  /** Location-dispatched byte read: fixture file or HTTP GET — the seam
    * body shared by the connectors' per-unit reads. */
  def readBytes(
      location: String,
      connectTimeoutMs: Int = 2000,
      readTimeoutMs: Int = 5000,
      retries: Int = 2): Either[HttpError, Array[Byte]] =
    if (isHttp(location))
      get(location, connectTimeoutMs, readTimeoutMs, retries)
    else
      try Right(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(location)))
      catch {
        case e: java.nio.file.NoSuchFileException =>
          Left(HttpError(s"fixture missing: $location",
            permanent = true, notFound = true))
        case e: java.io.IOException =>
          Left(HttpError(s"fixture read failed on $location: ${e.getMessage}",
            permanent = true))
      }
}
