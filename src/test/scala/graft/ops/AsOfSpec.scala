package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")

  test("backward as-of: latest right at-or-before, inclusive ties, nulls before first, per-key") {
    val left = Seq(
      (1L, ts(5), "l1"),  // after r@3 -> 30
      (1L, ts(10), "l2"), // ON r@10 -> inclusive match 100
      (1L, ts(2), "l0"),  // before any right for user 1? r@3 is later -> null... r@1? none
      (2L, ts(5), "l3"),  // user 2 has r@4 -> 40
      (3L, ts(5), "l4"))  // user 3 has no right rows -> null
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(10), 100.0),
      (2L, ts(4), 40.0),
      (2L, ts(6), 60.0)) // later than l3 — must not match backward
      .toDF("user_id", "ts", "v")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts")
      .select(col("tag"), col("v")).as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map(
      "l0" -> None, "l1" -> Some(30.0), "l2" -> Some(100.0),
      "l3" -> Some(40.0), "l4" -> None), s"got $out")
  }

  test("forward as-of: earliest right at-or-after, inclusive ties, nulls after last, per-key") {
    val left = Seq(
      (1L, ts(5), "l1"),  // next right is r@10 -> 100
      (1L, ts(10), "l2"), // ON r@10 -> inclusive match 100
      (1L, ts(11), "l3"), // past the last right for user 1 -> null
      (2L, ts(5), "l4"),  // user 2: r@4 is BEFORE -> must not match; r@6 -> 60
      (3L, ts(5), "l5"))  // user 3 has no right rows -> null
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(10), 100.0),
      (2L, ts(4), 40.0),
      (2L, ts(6), 60.0))
      .toDF("user_id", "ts", "v")

    val out = AsOf.joinForward(left, right, Seq("user_id"), "ts")
      .select(col("tag"), col("v")).as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map(
      "l1" -> Some(100.0), "l2" -> Some(100.0), "l3" -> None,
      "l4" -> Some(60.0), "l5" -> None), s"got $out")
  }

  test("a matched right row's NULL payload is carried as null, not skipped") {
    // user 1: r@3 has v=30 but note=null; r@6 has v=null, note="b". A left
    // row at @7 matches r@6 — BOTH its fields must come from r@6 (v null
    // included), never v=30 carried over from the older row.
    val left = Seq((1L, ts(7), "l1"), (1L, ts(4), "l2"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(3), Some(30.0), Option.empty[String]),
      (1L, ts(6), Option.empty[Double], Some("b")))
      .toDF("user_id", "ts", "v", "note")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts")
      .select(col("tag"), col("v"), col("note"))
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("l1") == (None, Some("b")), s"got ${out("l1")}")
    assert(out("l2") == (Some(30.0), None), s"got ${out("l2")}")

    val fwd = AsOf.joinForward(left, right, Seq("user_id"), "ts")
      .select(col("tag"), col("v"), col("note"))
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fwd("l2") == (None, Some("b")), s"forward got ${fwd("l2")}")
  }

  test("inputs containing reserved internal columns are rejected") {
    val left = Seq((1L, ts(1), 0)).toDF("user_id", "ts", "__side")
    val right = Seq((1L, ts(1), 1.0)).toDF("user_id", "ts", "v")
    val e = intercept[IllegalArgumentException](
      AsOf.joinBackward(left, right, Seq("user_id"), "ts"))
    assert(e.getMessage.contains("__side"))
  }

  test("payload collision with left columns fails loudly") {
    val left = Seq((1L, ts(1), "x")).toDF("user_id", "ts", "v")
    val right = Seq((1L, ts(1), 1.0)).toDF("user_id", "ts", "v")
    val e = intercept[IllegalArgumentException](
      AsOf.joinBackward(left, right, Seq("user_id"), "ts"))
    assert(e.getMessage.contains("v"))
  }

  test("row count and left columns are preserved exactly (left-join semantics)") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    val joined = AsOf.joinBackward(clicks, purchases, Seq("user_id"), "ts")
    assert(joined.count() == clicks.count(), "as-of must not drop or duplicate left rows")
    assert(joined.select(sum(col("pv").isNull.cast("int"))).head().getLong(0) > 0,
      "some clicks precede any purchase — nulls expected")
  }
}
