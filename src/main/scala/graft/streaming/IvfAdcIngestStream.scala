package graft.streaming

import org.apache.spark.sql.DataFrame

/** STREAMING IVFADC INGEST — the continual-ingest twin of the composed
  * ANN layout (q245/q250), completing the streaming story the MinHash
  * index ([[IncrementalIndex]], q79) and the BM25 index (q211) already
  * have: micro-batches of new vectors land as delta-sized generations
  * of a published IVFADC layout, with both quantizers FROZEN at the
  * base build — a batch's cost is |batch|·cells integer dots plus
  * |batch|·M·K code argmins, never a corpus pass, and probes keep
  * reading the same cell-pruned 8-int scan over the union of
  * generations.
  *
  * The ingest arithmetic is `LlmOps.ivfAdcAppendDelta` — INVOKED, never
  * re-implemented — so the streamed layout is bit-identical to the
  * batch-built one under ANY slicing of the delta into micro-batches
  * (per-vector assignment and encoding are pure functions of the frozen
  * quantizer tables). The registered q251 gate runs the streamed
  * layout's probe against q250's own DuckDB oracle, certifying
  * stream == batch cross-engine at every scale factor (the q246/q237
  * pattern on vectors).
  *
  * Replay discipline (the q79/q211 protocol verbatim): stream batch N
  * owns generation `batch_id = N+1` (generation 0 is the base build)
  * and writes it in overwrite mode, so a crashed-and-redelivered batch
  * rewrites its own files byte-identically instead of duplicating
  * vectors. A stream restarted on a FRESH checkpoint against an
  * already-advanced layout would overwrite old generations with new
  * vectors — the [[IncrementalIndex]] aging guard applies and the
  * handler refuses loudly.
  */
object IvfAdcIngestStream {

  /** Largest committed generation under `codesDir` (-1 if none) — from
    * the directory listing, no Spark job. */
  private def maxGeneration(s: org.apache.spark.sql.SparkSession,
      codesDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(codesDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** The foreachBatch handler: land one micro-batch of vectors
    * (vec_id, embedding) as generation `batchId + 1` of the IVFADC
    * layout at `root` (which must already hold the frozen `cents/` and
    * `codebook/` tables plus the `codes/batch_id=0` base generation —
    * `LlmOps.ivfAdcBuildBase`). Curry the root and pass to
    * `writeStream.foreachBatch(ingest(root) _)`. */
  def ingest(root: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq("cents", "codebook").foreach { t =>
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$t")),
        s"no frozen $t/ table at $root — build the base layout " +
          "(LlmOps.ivfAdcBuildBase) before streaming deltas into it")
    }
    // checkpoint/layout aging guard: generation N+1 beyond this batch's
    // own means a fresh checkpoint is replaying against an older layout
    // — overwriting would splice two ingest histories; refuse loudly.
    // (A crash-replay of batch N sees at most its OWN generation N+1.)
    val committed = maxGeneration(s, s"$root/codes")
    require(committed <= batchId + 1,
      s"layout at $root already holds generation batch_id=$committed but the " +
        s"stream is at batch $batchId — a fresh checkpoint is being replayed " +
        "against an older layout; point the stream at a fresh layout (or " +
        "restore the checkpoint)")
    graft.queries.LlmOps.ivfAdcAppendDelta(s,
      batch.select("vec_id", "embedding"), root, batchId + 1)
  }
}
