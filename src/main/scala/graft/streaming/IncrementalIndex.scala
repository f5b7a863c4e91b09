package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MinHash

/** Streaming continual-ingest dedup — the q79 index-probe loop as a
  * Structured Streaming `foreachBatch` sink: every micro-batch of new
  * documents is (1) PROBED against the maintained MinHash index (pairs
  * with everything ingested before it, plus intra-batch pairs), then
  * (2) APPENDED to that index so later batches dedup against it. This is
  * the shape a 100 TB ingest actually runs: the index grows monotonically,
  * each batch's cost scales with the batch, and the corpus is never
  * re-banded.
  *
  * Exactly-once discipline (the StreamingSpec foreachBatch pattern): both
  * the index appends and the emitted pairs land in `batch_id=N`
  * subdirectories with overwrite mode, so a post-crash replay of a batch
  * rewrites its own files instead of duplicating rows; and the probe
  * reads the index RESTRICTED to `batch_id < N`, so a replayed batch —
  * whose own previous append is already on disk — never pairs against
  * its own rows. On a real deployment the two writes would be one
  * transactional-table commit (or a q67-style idempotent MERGE); the
  * partition-dir protocol here gives the same replay-safety with plain
  * parquet.
  */
object IncrementalIndex {

  private val BandsSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("id", LongType)))
  private val SigsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType))))

  /** Read a batch_id-partitioned index dir that may not exist yet (first
    * batch); absent → empty frame with the right schema + batch_id.
    */
  private def readOrEmpty(s: org.apache.spark.sql.SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) s.read.schema(
        schema.add(StructField("batch_id", LongType))).parquet(dir)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema.add(StructField("batch_id", LongType)))
  }

  /** The foreachBatch handler: probe batch (doc_id, tokens) against the
    * index at `bandsDir`/`sigsDir`, write this batch's pairs to
    * `pairsDir/batch_id=N`, then append the batch's own band/sig rows as
    * `batch_id=N` index partitions. Curry the dirs and pass to
    * `writeStream.foreachBatch(handler(...) _)`.
    */
  def probeAndIndex(bandsDir: String, sigsDir: String, pairsDir: String,
      shingleN: Int = 2, k: Int = 64, nBands: Int = 8,
      maxBucket: Int = 100, minJaccard: Double = 0.5)
      (batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newBands = MinHash.explodedBands(docs, "doc_id", "tokens",
        shingleN, k, nBands, portable = true).select("band", "bucket", "id")
      val newSigs = docs.select(col("doc_id").as("id"),
          MinHash.signature(col("tokens"), shingleN, k, portable = true).as("sig"))
        .filter(col("sig").isNotNull)
      // replay safety: a redelivered batch's own prior append is on disk
      // under batch_id=N — excluding batch_id >= N keeps the probe
      // byte-identical to the first delivery
      val idxBands = readOrEmpty(s, bandsDir, BandsSchema)
        .filter(col("batch_id") < batchId).drop("batch_id")
      val idxSigs = readOrEmpty(s, sigsDir, SigsSchema)
        .filter(col("batch_id") < batchId).drop("batch_id")
      MinHash.incrementalProbe(idxBands, idxSigs, newBands, newSigs,
          maxBucket, minJaccard)
        .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
      newBands.write.mode("overwrite").parquet(s"$bandsDir/batch_id=$batchId")
      newSigs.write.mode("overwrite").parquet(s"$sigsDir/batch_id=$batchId")
    } finally docs.unpersist(blocking = false)
  }
}
