package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmOps

/** q251's streaming-ingest contract: probing the streamed IVFADC layout
  * equals the batch q250 probe under ANY slicing of the delta into
  * micro-batches, a byte-identical redelivered batch changes nothing,
  * the same handler produces the same layout under a LIVE MemoryStream
  * (the q246 live-parity discipline), and the fresh-checkpoint aging
  * guard refuses a stream whose checkpoint is younger than the layout.
  */
class IvfAdcStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val d = "/root/testdata/sf0.001"

  private def emb = graft.Tables.embeddings(spark, d)
  // the q250 base/delta split rule (IvfIncMod = 5)
  private def base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
  private def delta = emb.filter(pmod(col("vec_id"), lit(5)) === 0)

  private def root() =
    java.nio.file.Files.createTempDirectory("graft_ivfadcstr_").toString

  private def probe(r: String) =
    LlmOps.ivfAdcRank(LlmOps.ivfAdcProbe(spark, r,
      LlmOps.ivfAdcQueryPanel(spark, d))).collect().toSeq

  private lazy val batchReference =
    LlmOps.q250IvfAdcIncremental(spark, d).collect().toSeq

  test("a different slicing (3 contiguous id ranges) probes identically") {
    val r = root()
    LlmOps.ivfAdcBuildBase(spark, base, r)
    val hi = delta.agg(max("vec_id")).as[Long].head()
    val cut = hi / 3 + 1
    (0L until 3L).foreach { b =>
      IvfAdcIngestStream.ingest(r)(
        delta.filter(col("vec_id") >= b * cut && col("vec_id") < (b + 1) * cut), b)
    }
    assert(probe(r) == batchReference,
      "range-sliced streamed layout must probe equal to the batch q250 layout")
  }

  test("byte-identical redelivery of a batch changes neither codes nor probe") {
    val r = root()
    LlmOps.ivfAdcBuildBase(spark, base, r)
    val slice = (b: Long) =>
      delta.filter(pmod(expr("vec_id DIV 5"), lit(2)) === b)
    IvfAdcIngestStream.ingest(r)(slice(0L), 0L)
    IvfAdcIngestStream.ingest(r)(slice(1L), 1L)
    val once = probe(r)
    val rowsOnce = spark.read.parquet(s"$r/codes").count()
    // crash-and-replay: batch 1 lands again, byte-identical
    IvfAdcIngestStream.ingest(r)(slice(1L), 1L)
    assert(spark.read.parquet(s"$r/codes").count() == rowsOnce,
      "a redelivered batch must overwrite its own generation, not append")
    assert(probe(r) == once, "a redelivered batch must not change the probe")
    assert(once == batchReference, "two-batch stream must equal the batch layout")
  }

  test("the same handler runs under a live MemoryStream with identical results") {
    val r = root()
    LlmOps.ivfAdcBuildBase(spark, base, r)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(IvfAdcIngestStream.ingest(r) _).start()
    try {
      val rows = delta.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
      val (a, b) = rows.partition(v => (v._1 / 5) % 2 == 0)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(probe(r) == batchReference,
      "live-stream layout must probe equal to the batch q250 layout")
  }

  test("aging guard: a fresh checkpoint against an advanced layout refuses") {
    val r = root()
    LlmOps.ivfAdcBuildBase(spark, base, r)
    IvfAdcIngestStream.ingest(r)(delta.limit(3), 0L)
    IvfAdcIngestStream.ingest(r)(delta.limit(3), 1L)
    // a restarted stream on a FRESH checkpoint re-runs from batch 0;
    // the layout already holds generation 2 -> refuse, don't splice
    val ex = intercept[IllegalArgumentException] {
      IvfAdcIngestStream.ingest(r)(delta.limit(3), 0L)
    }
    assert(ex.getMessage.contains("fresh checkpoint"))
  }

  test("missing frozen quantizers refuse before any write") {
    val r = root()
    val ex = intercept[IllegalArgumentException] {
      IvfAdcIngestStream.ingest(r)(delta.limit(3), 0L)
    }
    assert(ex.getMessage.contains("ivfAdcBuildBase"))
  }
}
