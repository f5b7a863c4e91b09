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

  // ---- file-source e2e: the same transforms driven from a real file
  // stream of the events fixture (not MemoryStream), pinning batch/stream
  // parity through an actual source that lists, orders, and batches files.

  test("file-source e2e: windowed counts from a parquet stream match the batch twin") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream_in_").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"))
    // 4 input files + maxFilesPerTrigger=1 -> at least 4 micro-batches
    ev.repartition(4).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    // Complete mode: every window is in the sink regardless of watermark
    // progress, which is exactly the batch result — the parity statement
    val q = EventStreams.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("file_win_test")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_win_test")
        .as[(Timestamp, String, Long)].collect().toSet
      val want = EventStreams
        .windowedCounts(spark.read.parquet(src), "1 hour", "10 minutes")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got.nonEmpty && got == want)
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "the file source must have produced multiple micro-batches")
    } finally q.stop()
  }

  test("file-source e2e: sessionizer over the events fixture matches q33 per user") {
    import EventStreams.{Event, SessionOut}
    import scala.jdk.CollectionConverters._
    val stage = java.nio.file.Files.createTempDirectory("graft_sess_stage_")
    val src = java.nio.file.Files.createTempDirectory("graft_sess_in_")
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
      .select(col("ts"), col("user_id"), col("event_type"), col("value")).as[Event]

    // a per-user sentinel far beyond the gap closes every real session
    // in-batch; the sentinel's own session stays open and is never emitted
    val maxTs = ev.agg(max("ts")).collect().head.getTimestamp(0)
    val sentinelTs = new Timestamp(maxTs.getTime + 2L * 60 * 60 * 1000)
    val users = ev.map(_.user_id).distinct().collect().sorted.toSeq
    val sentinels = users.map(u => Event(sentinelTs, u, "flush", 0.0))

    // arrival order is controlled via modification time (the file source
    // processes oldest-first): real halves, then the sentinel file LAST —
    // a sentinel processed first would advance the watermark and absorb
    // the late real events into its own session
    def writeOne(df: org.apache.spark.sql.Dataset[Event], name: String, modMs: Long): Unit = {
      val tmp = stage.resolve(name)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().find(_.getName.endsWith(".parquet")).get.toPath
      val dest = src.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dest)
      assert(dest.toFile.setLastModified(modMs))
    }
    val now = System.currentTimeMillis()
    writeOne(ev.filter(_.user_id % 2 == 0), "c1_even", now - 10000)
    writeOne(ev.filter(_.user_id % 2 == 1), "c2_odd", now - 5000)
    writeOne(sentinels.toDS(), "c3_flush", now)

    val schema = spark.read.parquet(src.toString).schema
    val input = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString).as[Event]
    val q = EventStreams.sessionize(spark, input, gapMinutes = 30)
      .writeStream.format("memory").queryName("file_sess_test")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val perUser = spark.table("file_sess_test").as[SessionOut].collect()
        .groupBy(_.user_id)
        .map { case (u, ss) => (u, ss.length.toLong, ss.map(_.n_events).sum) }
        .toSet
      val batch = graft.queries.LlmOps.q33Sessionize(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(perUser == batch,
        "per-user (n_sessions, n_events) from the file-driven sessionizer must match q33")
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

  test("foreachBatch sink: per-batch-id overwrite is idempotent under replay") {
    val out = java.nio.file.Files.createTempDirectory("graft_febatch_").toString
    // the production exactly-once pattern: each micro-batch lands in its
    // own batch_id directory with overwrite mode, so re-delivery of a
    // batch (post-crash replay) rewrites the same files instead of
    // duplicating rows
    def writeBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      df.write.mode("overwrite").parquet(s"$out/batch_id=$id")
    val input = MemoryStream[(Timestamp, String)]
    val q = input.toDF().toDF("ts", "event_type")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch(writeBatch _)
      .start()
    try {
      input.addData((ts(0), "a"), (ts(1), "b")); q.processAllAvailable()
      input.addData((ts(2), "c")); q.processAllAvailable()
    } finally q.stop()
    val once = spark.read.parquet(out)
      .select("ts", "event_type").as[(Timestamp, String)].collect().toSet
    assert(once == Set((ts(0), "a"), (ts(1), "b"), (ts(2), "c")))
    // simulate replay of batch 1: same content, same id -> same result
    writeBatch(Seq((ts(2), "c")).toDF("ts", "event_type"), 1L)
    val replayed = spark.read.parquet(out)
      .select("ts", "event_type").as[(Timestamp, String)].collect().toSet
    assert(replayed == once, "replaying a batch must not duplicate rows")
  }

  test("stream-stream interval join: attribution matches the batch twin") {
    // (user, id, minute, type, value)
    val feed = Seq(
      (1L, 10L, 0, "click", 0.0),
      (1L, 20L, 5, "purchase", 9.99),   // 5 min after click 10 -> attributed
      (1L, 11L, 6, "click", 0.0),
      (1L, 21L, 20, "purchase", 5.0),   // within 30m of BOTH clicks -> 2 rows
      (2L, 12L, 0, "click", 0.0),
      (2L, 22L, 45, "purchase", 1.0),   // 45 min later -> NOT attributed
      (3L, 23L, 10, "purchase", 2.0))   // no click at all -> no row
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts")),
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value")))
    val names = Seq("user_id", "event_id", "ts", "event_type", "value")

    val batchDf = feed.map { case (u, id, m, t, v) => (u, id, ts(m), t, v) }
      .toDF(names: _*)
    val (bc, bp) = split(batchDf)
    val expected = EventStreams.attributionJoin(bc, bp, "30 MINUTES", "10 minutes")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(expected == Set(
      (1L, 10L, 20L, 5L * 60000000L, 9.99),
      (1L, 10L, 21L, 20L * 60000000L, 5.0),
      (1L, 11L, 21L, 14L * 60000000L, 5.0)))

    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val (sc, sp) = split(input.toDF().toDF(names: _*))
    val joined = EventStreams.attributionJoin(sc, sp, "30 MINUTES", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append).start()
    try {
      // deliver across several micro-batches, purchases before + after
      // their clicks are visible, to exercise both-side state buffering
      val rows = feed.map { case (u, id, m, t, v) => (u, id, ts(m), t, v) }
      input.addData(rows.take(2)); q.processAllAvailable()
      input.addData(rows.slice(2, 4)); q.processAllAvailable()
      input.addData(rows.drop(4)); q.processAllAvailable()
      val got = spark.table("attr_test")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == expected, "stream result must equal the batch twin")
    } finally q.stop()
  }

  test("stream-stream LEFT-OUTER join: null rows emit only on watermark eviction") {
    val names = Seq("user_id", "event_id", "ts", "event_type", "value")
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts")),
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value")))
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val (sc, sp) = split(input.toDF().toDF(names: _*))
    val joined = EventStreams.attributionJoinOuter(sc, sp, "30 MINUTES", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_outer_test")
      .outputMode(OutputMode.Append).start()
    def table = spark.table("attr_outer_test")
      .as[(Long, Long, Option[Long], Option[Long], Option[Double], Long)]
    try {
      // u1 converts; u2 never does; u3 purchases with no click (must
      // never appear — left outer, not full)
      input.addData(
        (1L, 10L, ts(0), "click", 0.0),
        (1L, 20L, ts(5), "purchase", 9.99),
        (2L, 12L, ts(2), "click", 0.0),
        (3L, 23L, ts(10), "purchase", 2.0))
      q.processAllAvailable()
      val afterB1 = table.collect().toSet
      assert(afterB1 == Set((1L, 10L, Some(20L), Some(5L * 60000000L), Some(9.99), 0L)),
        s"inner matches emit immediately, null rows must NOT: $afterB1")

      // advance the watermark past u2's click window (2 + 30 lag + 10
      // delay): events at :55 -> watermark 45. The GLOBAL watermark is
      // the min across BOTH sides, so the purchase stream must advance
      // too (u8's matchless purchase — left outer drops it); the
      // eviction batch runs on the NEXT trigger, so feed once more
      input.addData((9L, 90L, ts(55), "click", 0.0),
        (8L, 80L, ts(55), "purchase", 1.0))
      q.processAllAvailable()
      input.addData((9L, 91L, ts(59), "click", 0.0),
        (8L, 81L, ts(59), "purchase", 1.0))
      q.processAllAvailable()
      val finalSet = table.collect().toSet
      assert(finalSet == Set(
        (1L, 10L, Some(20L), Some(5L * 60000000L), Some(9.99), 0L),
        (2L, 12L, None, None, None, 1L)),
        s"evicted unmatched click must surface null-padded, once: $finalSet")
      // u9's clicks are still inside their match window -> withheld
      assert(!finalSet.exists(_._1 == 9L))
    } finally q.stop()
  }
}
