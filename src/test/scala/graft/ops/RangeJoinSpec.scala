package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val TenMinutes = 10L * 60 * 1000000

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2025-01-01 $s")

  test("half-open window semantics: [ts - lookback, ts), per key, left-preserving") {
    val purchases = Seq(
      (1L, 10L, ts("10:10:00.0")),
      (2L, 20L, ts("10:10:00.0")), // other user
      (3L, 10L, ts("09:00:00.0"))) // no clicks anywhere near
      .toDF("pid", "user_id", "ts")
    val clicks = Seq(
      (100L, 10L, ts("10:00:00.0")),  // exactly lookback before -> INCLUDED
      (101L, 10L, ts("10:09:59.999999")), // just before -> included
      (102L, 10L, ts("10:10:00.0")),  // simultaneous -> EXCLUDED (half-open)
      (103L, 10L, ts("09:59:59.999999")), // 1 us too early -> excluded
      (104L, 20L, ts("10:05:00.0")),  // other user's click
      (105L, 10L, ts("10:04:00.0")))  // mid-window, crosses a bin boundary
      .toDF("cid", "user_id", "c_ts")

    val out = RangeJoin.lookback(purchases, clicks, Seq("user_id"),
        "ts", "c_ts", TenMinutes, "pid")
      .select($"pid", $"cid".as[Option[Long]])
      .collect().groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.flatMap(r => Option(r.get(1))).toSet }

    assert(out(1L) == Set(100L, 101L, 105L), s"got ${out(1L)}")
    assert(out(2L) == Set(104L))
    assert(out(3L) == Set.empty, "zero-match purchase must survive with null payload")
    // exactly one row per unmatched left, no padding next to matches
    val n = RangeJoin.lookback(purchases, clicks, Seq("user_id"),
      "ts", "c_ts", TenMinutes, "pid").count()
    assert(n == 3 + 1 + 1, s"3 matches for p1, 1 for p2, 1 null row for p3; got $n")
  }

  test("plans as a hash equi-join, not a nested-loop join") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val c = e.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"), $"event_id".as("c_event_id"))
    val plan = RangeJoin.candidates(p, c, Seq("user_id"), "ts", "c_ts", TenMinutes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bin to an equi-join:\n$plan")
    assert(plan.contains("Join"), s"expected a join in:\n$plan")
  }

  test("inputs containing reserved internal columns are rejected") {
    val l = Seq((1L, 10L, ts("10:10:00.0"), 0L)).toDF("pid", "user_id", "ts", "__bin")
    val r = Seq((10L, ts("10:00:00.0"), 1L)).toDF("user_id", "c_ts", "cid")
    val e = intercept[IllegalArgumentException](
      RangeJoin.candidates(l, r, Seq("user_id"), "ts", "c_ts", TenMinutes))
    assert(e.getMessage.contains("__bin"))
  }

  test("binned join equals the naive interval cross-join on real data") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("c_ts"))
    val binned = RangeJoin.lookback(p, c.withColumnRenamed("cu", "user_id"),
        Seq("user_id"), "ts", "c_ts", TenMinutes, "event_id")
      .groupBy("event_id").agg(count($"c_ts").as("n"))
    val naive = p.join(c,
        p("user_id") === c("cu") &&
          c("c_ts") >= p("ts") - expr("INTERVAL 10 MINUTES") && c("c_ts") < p("ts"),
        "left")
      .groupBy("event_id").agg(count($"c_ts").as("n"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "bin-and-filter must reproduce the naive interval join exactly")
  }
}
