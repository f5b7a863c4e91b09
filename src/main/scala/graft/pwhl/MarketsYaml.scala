package graft.pwhl

import scala.io.Source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5 — YAML-config source: the markets registry
  * (`config/markets.yml`, consumed by transform_weather.py:28-42 and
  * materialize_dim_market.py:10-14) as a typed Spark dimension.
  *
  * The parser covers exactly the YAML subset the registry uses — one
  * top-level `<key>:` holding a list of flat `- k: v` mappings, comments,
  * quoted scalars — with no external dependency (the build is zero-egress
  * and Spark ships no YAML parser). Anything outside that subset fails
  * loudly rather than misparsing.
  */
object MarketsYaml {

  final case class Market(
      market: String, venue: String, venue_id: String, country: String,
      lat: Option[Double], lon: Option[Double], timezone: String)

  /** Parse the `markets:` list into case classes (driver-side: the config
    * is 8 entries; a config will never need a distributed read).
    */
  def parse(path: String): Seq[Market] = {
    val src = Source.fromFile(path, "UTF-8")
    val lines =
      try src.getLines().toVector
      finally src.close()

    var items = Vector.empty[Map[String, String]]
    var current: Map[String, String] = null
    var inMarkets = false

    def strip(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }

    lines.foreach { raw =>
      val line = raw.replace("﻿", "") // BOM guard (settings.yml has one)
      val noComment = {
        val i = line.indexOf('#')
        if (i >= 0 && line.take(i).count(_ == '"') % 2 == 0) line.take(i) else line
      }
      val t = noComment.trim
      if (t.nonEmpty) {
        if (!noComment.startsWith(" ") && t.endsWith(":")) {
          inMarkets = t == "markets:"
        } else if (inMarkets && t.startsWith("- ")) {
          if (current != null) items :+= current
          current = Map.empty
          val kv = t.drop(2)
          val i = kv.indexOf(':')
          require(i > 0, s"unsupported YAML list item: $raw")
          current += (kv.take(i).trim -> strip(kv.drop(i + 1)))
        } else if (inMarkets && current != null) {
          val i = t.indexOf(':')
          require(i > 0, s"unsupported YAML mapping line: $raw")
          current += (t.take(i).trim -> strip(t.drop(i + 1)))
        }
      }
    }
    if (current != null) items :+= current

    items.map { m =>
      Market(
        market = m.getOrElse("market", "").trim,
        venue = m.getOrElse("venue", "").trim,
        venue_id = m.getOrElse("venue_id", "").trim,
        country = m.getOrElse("country", "").trim,
        lat = m.get("lat").flatMap(v => scala.util.Try(v.toDouble).toOption),
        lon = m.get("lon").flatMap(v => scala.util.Try(v.toDouble).toOption),
        timezone = m.getOrElse("timezone", "").trim)
    }
  }

  /** The registry as a DataFrame — always broadcast-joined (8 rows). Drops
    * entries with blank market/venue like build_markets_df
    * (transform_weather.py:41).
    */
  def markets(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    parse(path).filter(m => m.market.nonEmpty && m.venue.nonEmpty).toDF()
  }

  /** The dim_market table (materialize_dim_market.py:21-25): minimal
    * column set enforced, missing columns materialized as nulls (P3).
    */
  def dimMarket(spark: SparkSession, path: String): DataFrame = {
    val need = Seq("venue_id" -> "string", "market" -> "string", "venue" -> "string",
      "country" -> "string", "lat" -> "double", "lon" -> "double", "timezone" -> "string")
    graft.ops.Cleaning
      .withMissingAsNull(graft.ops.Cleaning.normalizeColumns(markets(spark, path)), need)
      .selectExpr(need.map(_._1): _*)
  }
}
