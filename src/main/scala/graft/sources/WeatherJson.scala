package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4 — the HTTP JSON API source (ingest_weather.py:26-48), Spark-first.
  *
  * The reference GETs one columnar-JSON payload per market
  * (`{"hourly": {"time": [...], "temperature_2m": [...], ...}}`), turns
  * each into rows, stamps the market, and isolates per-market failures
  * (a failed market is skipped; the pipeline continues,
  * ingest_weather.py:79-97). This container has zero egress, so transport
  * is an injected payload list (exactly what requests.get returned); the
  * Spark side — columnar-to-row pivot via from_json + arrays_zip +
  * explode (the inverse of the API's column orientation), per-item error
  * isolation, market stamping (F12) — is the real surface.
  */
object WeatherJson {

  final case class Payload(market: String, venue: String, json: String)

  private val hourlySchema = StructType(Seq(
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(DoubleType)),
      StructField("wind_speed_10m", ArrayType(DoubleType)),
      StructField("precipitation", ArrayType(DoubleType)))))))

  /** Columnar payloads → tidy hourly rows (time, temperature_2m, …,
    * market, venue). Malformed or shape-violating payloads are dropped
    * whole (per-market isolation) and reported in `_2`.
    */
  def parseHourly(spark: SparkSession, payloads: Seq[Payload]): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val raw = payloads.toDF("market", "venue", "json")
      .withColumn("h", from_json(col("json"), hourlySchema).getField("hourly"))
    // a parse failure (null struct / null time array) fails ONLY its market
    val bad = raw.filter(col("h").isNull || col("h.time").isNull)
      .select("market").as[String].collect().toSeq
    val good = raw.filter(col("h").isNotNull && col("h.time").isNotNull)
    val rows = good.select(col("market"), col("venue"),
      explode(arrays_zip(
        col("h.time"), col("h.temperature_2m"), col("h.relative_humidity_2m"),
        col("h.wind_speed_10m"), col("h.precipitation"))).as("r"))
      .select(
        col("r.time").as("time"),
        col("r.temperature_2m").as("temperature_2m"),
        col("r.relative_humidity_2m").as("relative_humidity_2m"),
        col("r.wind_speed_10m").as("wind_speed_10m"),
        col("r.precipitation").as("precipitation"),
        col("market"), col("venue"))
    (rows, bad)
  }
}
