package graft.streaming

import org.apache.spark.sql.DataFrame

/** STREAMING SEMANTIC-DEDUP INGEST — the continual-ingest twin of the
  * q255 incremental semantic-dedup index, completing the streaming
  * story beside MinHash ([[IncrementalIndex]], q79), BM25 (q211) and
  * IVFADC ([[IvfAdcIngestStream]], q251): micro-batches of new vectors
  * land as delta-sized `members/batch_id=N` generations of a published
  * layout whose centroid seeds are FROZEN at the base build, and each
  * batch eagerly emits its pair file (`pairs/batch_id=N`) — batch
  * cost is |batch|·K assignment dots plus |batch|·cell-density pair
  * scoring, never a corpus pass.
  *
  * The ingest arithmetic is `LlmOps.semIncrAppendDelta` — INVOKED,
  * never re-implemented — so the unioned pair files are identical to
  * the batch q255 probe under ANY slicing of the delta (per-vector
  * assignment is a pure function of the frozen seeds, and pair
  * emission is eager: each pair forms exactly once, in the generation
  * of its LATER member). The registered q257 gate runs the unioned
  * pairs against q255's own DuckDB oracle, certifying stream == batch
  * cross-engine at every scale factor.
  *
  * Replay discipline (the q79/q211/q251 protocol verbatim): stream
  * batch N owns generation `batch_id = N+1` (generation 0 is the base
  * assignment) and writes members AND pairs in overwrite mode; the
  * prior-generation read is partition-pruned to `batch_id < N+1`, so a
  * crashed-and-redelivered batch recomputes byte-identically instead
  * of duplicating pairs. A stream restarted on a FRESH checkpoint
  * against an already-advanced layout would splice two ingest
  * histories — the aging guard refuses loudly.
  */
object SemDedupIngestStream {

  /** Largest committed generation under `membersDir` (-1 if none) —
    * from the directory listing, no Spark job. */
  private def maxGeneration(s: org.apache.spark.sql.SparkSession,
      membersDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(membersDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** The foreachBatch handler: land one micro-batch of vectors
    * (vec_id, embedding) as generation `batchId + 1` of the layout at
    * `root` (which must already hold the frozen `cents/` seeds plus
    * the `members/batch_id=0` base generation —
    * `LlmOps.semIncrBuildBase`). Curry the root and pass to
    * `writeStream.foreachBatch(ingest(root) _)`. */
  def ingest(root: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$root/cents")),
      s"no frozen cents/ seed table at $root — build the base layout " +
        "(LlmOps.semIncrBuildBase) before streaming deltas into it")
    val committed = maxGeneration(s, s"$root/members")
    require(committed <= batchId + 1,
      s"layout at $root already holds generation batch_id=$committed but the " +
        s"stream is at batch $batchId — a fresh checkpoint is being replayed " +
        "against an older layout; point the stream at a fresh layout (or " +
        "restore the checkpoint)")
    // The mirror-image splice (round-16 advice): a layout RESTORED from
    // an older backup against an advanced checkpoint is missing
    // intermediate generations — pair emission pairs each batch against
    // every EARLIER generation, so a gap silently under-pairs. Only the
    // exactly-previous generation (committed == batchId) or a
    // redelivered one (committed == batchId + 1) is a legal
    // continuation; anything older is a gapped history.
    require(committed >= batchId,
      s"layout at $root tops out at generation batch_id=$committed but the " +
        s"stream is at batch $batchId — generations " +
        s"${committed + 1}..$batchId are missing (layout restored from an " +
        "older backup?); pairs against the absent generations would be " +
        "silently dropped. Restore a matching layout or restart the stream " +
        "from a checkpoint aligned with this layout")
    graft.queries.LlmOps.semIncrAppendDelta(s,
      batch.select("vec_id", "embedding"), root, batchId + 1)
  }
}
