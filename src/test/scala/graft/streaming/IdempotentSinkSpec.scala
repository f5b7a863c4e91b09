package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactly-once sink semantics under redelivery: a replayed batch must
  * change NOTHING — not the appended fact partitions, not the upsert
  * state — and a fresh checkpoint pointed at an old sink must be
  * refused, not interleaved.
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString

  // (key, ver, value) — ver first in the payload so the within-batch
  // collapse is version-latest
  private def kv(rows: (Long, Long, String)*) =
    rows.toDF("k", "ver", "v")

  test("upsert: end-to-end stream applies batch-wins + version-latest merge") {
    val dir = tmp("upsert")
    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("k", "ver", "v").writeStream
      .foreachBatch(IdempotentSink.upsertHandler(dir, Seq("k")) _).start()
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1")); q.processAllAvailable()
      // key 1 updated; key 3 new; key 2 untouched carries over
      input.addData((1L, 2L, "a2"), (3L, 1L, "c1")); q.processAllAvailable()
    } finally q.stop()
    val got = IdempotentSink.latest(spark, dir)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
  }

  test("upsert: duplicate keys within a batch collapse to the max version") {
    val dir = tmp("upsertdup")
    IdempotentSink.upsertHandler(dir, Seq("k"))(
      kv((1L, 1L, "old"), (1L, 3L, "new"), (1L, 2L, "mid")), 0L)
    val got = IdempotentSink.latest(spark, dir)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "new")))
  }

  test("upsert: redelivered batch rebuilds its generation byte-identically") {
    val dir = tmp("replay")
    IdempotentSink.upsertHandler(dir, Seq("k"))(kv((1L, 1L, "a1")), 0L)
    IdempotentSink.upsertHandler(dir, Seq("k"))(
      kv((1L, 2L, "a2"), (2L, 1L, "b1")), 1L)
    val first = IdempotentSink.latest(spark, dir)
      .as[(Long, Long, String)].collect().toSet
    // crash after commit, redeliver batch 1: parent is still gen=0, so
    // the merge re-derives the same state — and no third generation
    IdempotentSink.upsertHandler(dir, Seq("k"))(
      kv((1L, 2L, "a2"), (2L, 1L, "b1")), 1L)
    val second = IdempotentSink.latest(spark, dir)
      .as[(Long, Long, String)].collect().toSet
    assert(first == second)
    assert(second == Set((1L, 2L, "a2"), (2L, 1L, "b1")))
    assert(new java.io.File(dir).list().count(_.startsWith("gen=")) == 2)
  }

  test("append: redelivery overwrites its own partition, never duplicates") {
    val dir = tmp("append")
    IdempotentSink.appendHandler(dir)(kv((1L, 1L, "a")), 0L)
    IdempotentSink.appendHandler(dir)(kv((2L, 1L, "b"), (3L, 1L, "c")), 1L)
    IdempotentSink.appendHandler(dir)(kv((2L, 1L, "b"), (3L, 1L, "c")), 1L)
    val got = IdempotentSink.appended(spark, dir)
    assert(got.count() == 3L)
    assert(got.filter(col("batch_id") === 1).count() == 2L)
  }

  test("fresh checkpoint against an old sink is refused loudly") {
    val dir = tmp("guard")
    IdempotentSink.upsertHandler(dir, Seq("k"))(kv((1L, 1L, "a")), 5L)
    val e = intercept[IllegalArgumentException](
      IdempotentSink.upsertHandler(dir, Seq("k"))(kv((2L, 1L, "b")), 3L))
    assert(e.getMessage.contains("fresh checkpoint"))
    val dir2 = tmp("guard2")
    IdempotentSink.appendHandler(dir2)(kv((1L, 1L, "a")), 5L)
    intercept[IllegalArgumentException](
      IdempotentSink.appendHandler(dir2)(kv((2L, 1L, "b")), 3L))
  }

  test("sweep keeps the replay parent and refuses keep < 2") {
    val dir = tmp("sweep")
    (0L to 4L).foreach(i =>
      IdempotentSink.upsertHandler(dir, Seq("k"))(kv((i, 1L, s"v$i")), i))
    val dropped = IdempotentSink.sweepGenerations(spark, dir, keep = 2)
    assert(dropped == Seq(0L, 1L, 2L))
    // replay of the newest batch still works off its surviving parent
    IdempotentSink.upsertHandler(dir, Seq("k"))(kv((4L, 1L, "v4")), 4L)
    assert(IdempotentSink.latest(spark, dir).count() == 5L)
    intercept[IllegalArgumentException](
      IdempotentSink.sweepGenerations(spark, dir, keep = 1))
  }
}
