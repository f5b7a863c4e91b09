package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q128 resample/LOCF: the audit counts are replayed independently in
  * Scala from the raw fixture — including the LOCF VALUES the registered
  * audit only counts — so the fill semantics (carry at-or-before, never
  * invent before first observation) are pinned exactly.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q128 audit equals a full Scala replay of the hourly LOCF grid") {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).cast("long").as("h"),
        col("value"))
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    val hours = ev.map(_._3)
    val grid = (hours.min to hours.max by 3600L).toVector
    // per (user, hour) observation: max value among that hour's purchases
    val obs = ev.filter(_._2 == "purchase")
      .groupBy(r => (r._1, r._3))
      .collect { case ((u, h), rs) if rs.exists(_._4.isDefined) =>
        (u, h) -> rs.flatMap(_._4).max
      }
    val users = ev.map(_._1).distinct.sorted
    val expected = users.map { u =>
      var lastSeen: Option[Long] = None
      var carried: Option[Double] = None
      var observed = 0; var filled = 0; var leading = 0
      grid.foreach { h =>
        obs.get((u, h)) match {
          case Some(v) => carried = Some(v); lastSeen = Some(h); observed += 1
          case None =>
            if (carried.isDefined) filled += 1 else leading += 1
        }
      }
      (u, grid.size.toLong, observed.toLong, filled.toLong, leading.toLong,
        lastSeen)
    }
    val got = Warehouse.q128Resample(spark, d)
      .select(col("user_id"), col("n_points"), col("n_observed"),
        col("n_filled"), col("n_leading_nulls"),
        col("last_seen_hour").cast("long"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
  }
}
