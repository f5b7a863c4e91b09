package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming sketch-table maintenance: estimates track the exact
  * distinct vocabulary across micro-batches, the merge reads only sketch
  * rows, and a replayed batch changes nothing (overwrite protocol AND
  * HLL union idempotence).
  */
class SketchMaintainerSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("per-batch sketches merge to the exact vocabulary; replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_").toString + "/sk"
    val input = MemoryStream[(String, String, String)]
    val q = input.toDF().toDF("source", "lang", "text")
      .writeStream.foreachBatch(SketchMaintainer.ingest(dir) _).start()
    try {
      input.addData(
        ("s1", "en", "alpha beta gamma"),
        ("s1", "de", "beta delta"),
        ("s2", "en", "alpha alpha epsilon"))
      q.processAllAvailable()
      // batch 1 overlaps batch 0's vocabulary — the union must dedup
      // across batches AND languages, which exact per-part counts cannot
      input.addData(
        ("s1", "en", "gamma zeta"),
        ("s2", "en", "epsilon eta theta"))
      q.processAllAvailable()
    } finally q.stop()

    // s1: {alpha beta gamma delta zeta} = 5; s2: {alpha epsilon eta theta} = 4
    val got = SketchMaintainer.estimates(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 3L, 5L), ("s2", 2L, 4L)),
      s"estimates diverged from exact vocabulary: $got")

    // replay batch 1 out-of-band (crash-recovery shape): same rows land
    // in the same partition dir; estimates must not move
    SketchMaintainer.ingest(dir)(
      Seq(("s1", "en", "gamma zeta"), ("s2", "en", "epsilon eta theta"))
        .toDF("source", "lang", "text"), 1L)
    val replayed = SketchMaintainer.estimates(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(replayed == got, "a replayed batch must not move the estimates")

    // the merge path reads only sketch rows — no text column anywhere
    assert(!spark.read.parquet(dir).columns.contains("text"))
  }

  test("double-counting a batch cannot corrupt estimates (HLL idempotence)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sk2_").toString + "/sk"
    val docs = Seq(("s1", "en", "one two three")).toDF("source", "lang", "text")
    SketchMaintainer.ingest(dir)(docs, 0L)
    // simulate an at-least-once failure: the SAME batch lands twice
    // under two different batch ids
    SketchMaintainer.ingest(dir)(docs, 1L)
    val got = SketchMaintainer.estimates(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 2L, 3L)),
      s"duplicate sketch rows must union to the same 3-token vocabulary: $got")
  }
}
