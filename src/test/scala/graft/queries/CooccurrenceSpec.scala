package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q99 matches an independent basket recomputation exactly") {
    val baskets = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
      .as[(Long, java.sql.Date, String)].collect()
      .map(r => (r._1, r._2.toString, r._3)).toSet
    val types = baskets.map(_._3).toSeq.distinct.sorted
    val sizes = types.map(t => t -> baskets.count(_._3 == t)).toMap
    val byBasket = baskets.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet)
    val expected = for {
      a <- types; b <- types if a < b
      inter = byBasket.values.count(s => s(a) && s(b))
      if inter > 0
    } yield (a, b, inter.toLong, sizes(a).toLong, sizes(b).toLong,
      inter.toLong * 1000000L / (sizes(a) + sizes(b) - inter))
    val out = Warehouse.q99Cooccurrence(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == expected.toSeq)
  }

  test("q99 jaccard is bounded and the matrix is an upper triangle") {
    val out = Warehouse.q99Cooccurrence(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, inter, na, nb, j) =>
      assert(a < b, "upper triangle only")
      assert(inter <= math.min(na, nb))
      assert(j >= 0L && j <= 1000000L)
    }
  }

  test("q99's final plan reads the event log once past the checkpoint") {
    val plan = Warehouse.q99Cooccurrence(spark, d)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0, s"event log must not be re-read past the checkpoint, got $scans")
  }
}
