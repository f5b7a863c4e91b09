package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming continual-ingest dedup: each micro-batch pairs only against
  * what was ingested BEFORE it plus itself, the index grows per batch,
  * and a replayed batch neither duplicates pairs nor pairs against its
  * own previous append.
  */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def dirs() = {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_").toString
    (s"$root/bands", s"$root/sigs", s"$root/pairs")
  }

  private def toDocs(df: org.apache.spark.sql.DataFrame) =
    df.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tokens"))

  // long-ish docs so 2-shingle signatures exist and identical text ⇒ est 1.0
  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textB = "one two three four five six seven eight nine"
  private val textC = "red orange yellow green blue indigo violet umbra"

  test("batches pair against prior ingest + themselves; index grows; replay is idempotent") {
    val (bands, sigs, pairs) = dirs()
    val handler = IncrementalIndex.probeAndIndex(bands, sigs, pairs) _
    val input = MemoryStream[(Long, String)]
    val q = toDocs(input.toDF()).writeStream.foreachBatch(handler).start()
    try {
      // batch 0: two unrelated docs -> no pairs, index seeded
      input.addData((1L, textA), (2L, textB)); q.processAllAvailable()
      // batch 1: 3 = dup of 1 (new_old), 5/6 intra-batch dups (new_new), 4 unique
      input.addData((3L, textA), (4L, textC), (5L, textB + " extra"),
        (6L, textB + " extra"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(pairs)
      .select("batch_id", "id_a", "id_b", "kind")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, "new_old"),
      (1L, 2L, 5L, "new_old"), (1L, 2L, 6L, "new_old"),
      (1L, 5L, 6L, "new_new")),
      s"unexpected pair set: $got")

    // the index holds every ingested doc across both batch partitions
    val indexed = spark.read.parquet(sigs).select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 3L, 4L, 5L, 6L))

    // replay batch 1: its own append is on disk, yet the probe must see
    // only batch 0 -> byte-identical pair set, no self-pairing, no dupes
    IncrementalIndex.probeAndIndex(bands, sigs, pairs)(
      toDocs(Seq((3L, textA), (4L, textC), (5L, textB + " extra"),
        (6L, textB + " extra")).toDF("doc_id", "text")), 1L)
    val replayed = spark.read.parquet(pairs)
      .select("batch_id", "id_a", "id_b", "kind")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(replayed == got, "replaying a batch must not change the pair set")
  }

  test("a re-ingested doc supersedes its indexed version: one pair row, new content wins") {
    val (bands, sigs, pairs) = dirs()
    val h = IncrementalIndex.probeAndIndex(bands, sigs, pairs) _
    // batch 0: doc 1 = textA; batch 1: doc 1 RE-INGESTED as textC (re-crawl)
    h(toDocs(Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")), 0L)
    h(toDocs(Seq((1L, textC)).toDF("doc_id", "text")), 1L)
    // batch 2: doc 9 = textC — must pair against doc 1's NEW content
    // exactly once (keep-latest), never against the stale textA version
    h(toDocs(Seq((9L, textC)).toDF("doc_id", "text")), 2L)
    val b2 = spark.read.parquet(pairs).filter(col("batch_id") === 2)
      .select("id_a", "id_b", "kind", "est_jaccard")
      .as[(Long, Long, String, Double)].collect().toList
    assert(b2 == List((1L, 9L, "new_old", 1.0)),
      s"expected exactly one pair against the re-ingested content: $b2")
  }

  test("a fresh checkpoint against an existing index is refused, not corrupted") {
    val (bands, sigs, pairs) = dirs()
    val h = IncrementalIndex.probeAndIndex(bands, sigs, pairs) _
    h(toDocs(Seq((1L, textA)).toDF("doc_id", "text")), 0L)
    h(toDocs(Seq((2L, textB)).toDF("doc_id", "text")), 1L)
    // a stream restarted on a new checkpoint would re-deliver batch 0;
    // the index already holds batch_id=1 -> must fail loudly
    val e = intercept[IllegalArgumentException] {
      h(toDocs(Seq((3L, textC)).toDF("doc_id", "text")), 0L)
    }
    assert(e.getMessage.contains("fresh checkpoint"), e.getMessage)
  }
}
