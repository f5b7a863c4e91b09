package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once `foreachBatch` sinks over plain parquet — the
  * [[IncrementalIndex]] batch_id-partition protocol extracted into the
  * two reusable shapes every streaming pipeline ends in:
  *
  *  1. APPEND ([[appendHandler]]): each micro-batch lands in its own
  *     `batch_id=N` partition directory with overwrite mode, so a
  *     post-crash redelivery of batch N rewrites its own files instead
  *     of duplicating rows. Readers see an append-only fact table
  *     partitioned by batch (and can prune on it).
  *
  *  2. KEYED UPSERT ([[upsertHandler]]): the q67 MERGE as a streaming
  *     sink. State lives in GENERATION directories `gen=N` (N = the
  *     batch id that produced it); batch N merges into the latest
  *     generation STRICTLY BELOW N and overwrites `gen=N`. A replayed
  *     batch therefore re-derives its generation from the same parent
  *     and writes the same bytes — idempotent by construction, no
  *     transaction log needed. Within a batch, duplicate keys collapse
  *     deterministically (lexicographic max of the non-key struct —
  *     ver-column-first, so callers order columns meaningfully); across
  *     batches the NEWER BATCH WINS (CDC apply semantics).
  *
  * Both handlers refuse a batch id BELOW what the directory already
  * holds — the [[IncrementalIndex]] fresh-checkpoint guard: a stream
  * restarted on a new checkpoint against an old sink directory would
  * silently interleave two ingest histories; fail loudly instead.
  *
  * At fleet scale the generation write is state-sized, not stream-
  * lifetime-sized — the same class of cost as a compaction pass — and
  * old generations are reclaimed with [[sweepGenerations]] once the
  * stream's checkpoint has advanced past them (keep ≥ 2 so the current
  * batch's parent always survives a crash). A transactional table
  * format would replace the directory protocol 1:1.
  */
object IdempotentSink {

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def dirIds(s: SparkSession, dir: String, prefix: String): Seq[Long] = {
    val p = new Path(dir)
    val f = fs(s, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong)
  }

  private def guardHistory(ids: Seq[Long], batchId: Long, dir: String): Unit =
    require(ids.forall(_ <= batchId),
      s"sink at $dir already holds batch ${ids.max} but the stream is at " +
        s"batch $batchId — a fresh checkpoint is being replayed against an " +
        "older sink; point the stream at an empty directory (or restore " +
        "the checkpoint)")

  /** Replay-safe append: curry the directory, pass to
    * `writeStream.foreachBatch(IdempotentSink.appendHandler(dir) _)`.
    */
  def appendHandler(outDir: String)(batch: DataFrame, batchId: Long): Unit = {
    guardHistory(dirIds(batch.sparkSession, outDir, "batch_id="),
      batchId, outDir)
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** The appended fact table (with its `batch_id` partition column). */
  def appended(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)

  /** Replay-safe keyed upsert: curry state dir + key columns. */
  def upsertHandler(stateDir: String, keyCols: Seq[String])
      (batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val gens = dirIds(s, stateDir, "gen=")
    guardHistory(gens, batchId, stateDir)
    val payloadCols = batch.columns.filterNot(keyCols.contains).toSeq
    // deterministic within-batch collapse: per key, the lexicographic
    // max of the payload struct (callers put the version column first)
    val dedup = batch.groupBy(keyCols.map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("__p"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
    val parent = gens.filter(_ < batchId) match {
      case Seq() => None
      case g     => Some(g.max)
    }
    val merged = parent match {
      case None => dedup
      case Some(g) =>
        val prev = s.read.parquet(s"$stateDir/gen=$g")
          .select(batch.columns.map(col).toSeq: _*)
        prev.join(dedup.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(dedup)
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/gen=$batchId")
  }

  /** The current state: the largest committed generation (empty-free —
    * callers guard on an empty dir). */
  def latest(s: SparkSession, stateDir: String): DataFrame = {
    val gens = dirIds(s, stateDir, "gen=")
    require(gens.nonEmpty, s"no generations at $stateDir")
    s.read.parquet(s"$stateDir/gen=${gens.max}")
  }

  /** Reclaim all but the newest `keep` generations (keep ≥ 2: the
    * current batch's PARENT must survive a crash-replay). Returns the
    * removed generation ids. */
  def sweepGenerations(s: SparkSession, stateDir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 2, "keep >= 2: a replayed batch re-reads its parent")
    val gens = dirIds(s, stateDir, "gen=").sorted
    val drop = gens.dropRight(keep)
    val f = fs(s, stateDir)
    drop.foreach(g => f.delete(new Path(s"$stateDir/gen=$g"), true))
    drop
  }
}
