package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming over the `events` shape (SURVEY §7.5): tumbling
  * windows with a watermark (late data dropped once the watermark passes)
  * and stateful streaming dedup. MemoryStream drives deterministic
  * micro-batches; `processAllAvailable` barriers each batch.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("tumbling window + watermark: finalizes windows, drops late data") {
    val input = MemoryStream[(Timestamp, String)]
    val agg = EventStreams
      .windowedCounts(input.toDF().toDF("ts", "event_type"), "5 minutes", "10 minutes")
      .select(col("window_start").as("ws"), col("event_type").as("k"),
        col("n_events").as("count"))
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: three on-time events in [10:00,10:05)
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(3), "b"))
      q.processAllAvailable()
      assert(spark.table("win_test").count() == 0, "no window may close before the watermark passes it")

      // batch 2: event at 10:20 -> watermark advances to 10:10 at batch end
      input.addData((ts(20), "a"))
      q.processAllAvailable()

      // batch 3: late event at 10:02 (< watermark 10:10) must be dropped;
      // [10:00,10:05) closes this batch with the on-time counts only
      input.addData((ts(2), "a"))
      q.processAllAvailable()

      // batches 4-5: 10:40 advances the watermark to 10:30 (closes
      // [10:20,10:25)); 10:55 advances it to 10:45 (closes [10:40,10:45));
      // the z event's own window stays open
      input.addData((ts(40), "a"))
      q.processAllAvailable()
      input.addData((ts(55), "z"))
      q.processAllAvailable()

      val rows = spark.table("win_test").as[(Timestamp, String, Long)].collect().toSet
      assert(rows == Set(
        (ts(0), "a", 2L),   // late 10:02 NOT counted
        (ts(0), "b", 1L),
        (ts(20), "a", 1L),
        (ts(40), "a", 1L)))
    } finally q.stop()
  }

  test("stream-static join: every micro-batch enriches against a broadcast dim") {
    val dim = Seq(("click", "engagement"), ("purchase", "conversion")).toDF("event_type", "category")
    val input = MemoryStream[(Timestamp, String)]
    val joined = input.toDF().toDF("ts", "event_type")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"), "left")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "click"), (ts(1), "error"), (ts(2), "purchase"))
      q.processAllAvailable()
      val rows = spark.table("ssj_test")
        .select("event_type", "category").as[(String, String)].collect().toSet
      assert(rows == Set(("click", "engagement"), ("purchase", "conversion"), ("error", null)))
    } finally q.stop()
  }

  test("streaming dropDuplicates: stateful dedup by key") {
    val input = MemoryStream[(Timestamp, String)]
    val dedup = EventStreams
      .dedupEvents(input.toDF().toDF("ts", "event_id"), "10 minutes")
      .select(col("event_id").as("id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "x"), (ts(1), "x"), (ts(2), "y"))
      q.processAllAvailable()
      input.addData((ts(3), "x"), (ts(4), "z"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").as[String].collect().sorted.toSeq
      assert(ids == Seq("x", "y", "z"), "each id must be emitted exactly once")
    } finally q.stop()
  }
}
