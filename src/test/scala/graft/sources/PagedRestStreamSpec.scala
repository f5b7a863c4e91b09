package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The REST cursor stream's contract beyond the q254 gate: offsets are
  * item counts checkpointed across restarts (resume exactly after the
  * last ingested item — no replay, no loss), a trigger against an
  * unchanged collection ingests nothing, growth that only FILLS the
  * partial last page is still picked up (the page-rewrite case), and a
  * shrinking re-publish refuses loudly instead of serving spliced
  * pages.
  */
class PagedRestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val PageSize = 4

  private def publish(dir: Path, n: Int): Unit = {
    Files.createDirectories(dir)
    val nPages = (n + PageSize - 1) / PageSize
    (0 until nPages).foreach { p =>
      val items = (p * PageSize until math.min((p + 1) * PageSize, n))
        .map(i => s"""{"id": ${i + 1}, "name": "it$i", "value": $i.5}""")
        .mkString(", ")
      Files.write(dir.resolve(s"page-$p.json"),
        s"""{"total": $n, "page_size": $PageSize, "items": [$items]}"""
          .getBytes(StandardCharsets.UTF_8))
    }
    Files.write(dir.resolve("meta.json"),
      s"""{"total": $n, "page_size": $PageSize}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  private def runOnce(pages: Path, root: Path): Unit = {
    val q = spark.readStream.format("graft-rest")
      .option("pages", pages.toString)
      .option("pagesPerPartition", 2).option("strict", true)
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (df: DataFrame, bid: Long) =>
        df.write.mode("overwrite").parquet(s"$root/ingest/batch_id=$bid")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def ingested(root: Path): Seq[(Long, Long, Int)] =
    spark.read.parquet(s"$root/ingest")
      .select($"batch_id".cast("long"), $"id", $"page")
      .as[(Long, Long, Int)].collect().toSeq.sorted

  test("growth ingests exactly the new items; partial-page fills included") {
    val root = Files.createTempDirectory("rest_stream_")
    val pages = root.resolve("pages")
    publish(pages, 6) // pages 0 (full) + 1 (partial: 2 of 4)
    runOnce(pages, root)
    assert(ingested(root).map(_._2) == (1L to 6L))
    // growth that only FILLS page 1 (6 -> 8): the rewritten page's new
    // tail items — and nothing else — arrive as batch 1
    publish(pages, 8)
    runOnce(pages, root)
    val got = ingested(root)
    assert(got.map(_._2) == (1L to 8L), "no loss, no replay")
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(7L, 8L),
      s"batch 1 must hold exactly the fill items: $got")
    assert(got.filter(_._1 == 1L).forall(_._3 == 1),
      "fill items come from the rewritten partial page")
  }

  test("a trigger against an unchanged collection ingests nothing") {
    val root = Files.createTempDirectory("rest_stream_")
    val pages = root.resolve("pages")
    publish(pages, 5)
    runOnce(pages, root)
    val before = ingested(root)
    runOnce(pages, root) // no growth
    assert(ingested(root) == before, "an empty trigger must change nothing")
    assert(!Files.exists(root.resolve("ingest/batch_id=1")),
      "no growth -> no new batch directory")
  }

  test("Trigger.AvailableNow drains an UNCOMMITTED batch plus all growth " +
    "to the start-time bound, then stops (SupportsTriggerAvailableNow)") {
    val root = Files.createTempDirectory("rest_stream_")
    val pages = root.resolve("pages")
    publish(pages, 6)
    runOnce(pages, root) // batch 0: items 1..6
    publish(pages, 10)
    runOnce(pages, root) // batch 1: items 7..10
    assert(ingested(root).map(_._2) == (1L to 10L))
    // plant a crash between offset-log write and commit: batch 1's
    // commit marker vanishes, its offset entry stays — the exact state
    // the engine's single-batch fallback warns it may NOT finish from
    // (the hidden Hadoop .crc shadow must go too, or the local FS
    // blocks the recovery run's re-commit rename)
    Files.delete(root.resolve("ckpt/commits/1"))
    Files.deleteIfExists(root.resolve("ckpt/commits/.1.crc"))
    publish(pages, 14) // growth the drained run must ALSO pick up
    runOnce(pages, root)
    val got = ingested(root)
    assert(got.map(_._2) == (1L to 14L),
      s"drain must cover the uncommitted batch AND the growth: $got")
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(7L, 8L, 9L, 10L),
      "the uncommitted batch replays from the offset log, byte-identical")
    assert(got.filter(_._1 == 2L).map(_._2) == Seq(11L, 12L, 13L, 14L),
      "the post-recovery batch drains to the prepared bound")
    // drained: a further unchanged-collection run adds nothing
    runOnce(pages, root)
    assert(ingested(root) == got)
  }

  test("a shrinking re-publish refuses loudly (cursor invalidation)") {
    val root = Files.createTempDirectory("rest_stream_")
    val pages = root.resolve("pages")
    publish(pages, 8)
    runOnce(pages, root)
    publish(pages, 3) // history rewritten: total below the cursor
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(pages, root)
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(c => Option(c.getMessage)).mkString(" | ")
    assert(msgs.contains("shrank") || msgs.contains("fresh checkpoint"),
      s"shrink must refuse with cursor guidance, got: $msgs")
  }
}
