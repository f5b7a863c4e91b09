package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACTLY-ONCE CDC APPLY into a graft-kv table — the missing piece
  * between the streaming ring and the delta connector: a change stream
  * (Kafka-shaped `(ver, op, id, name, value)` records) lands in a
  * merge-on-read keyed table through `foreachBatch` + SQL MERGE, and a
  * crash-redelivered micro-batch applies ZERO ops the second time.
  *
  * Idempotence is the Delta txnAppId/txnVersion design on the kv
  * commit log: each batch's MERGE commits under a transaction tag
  * `<streamId>/<batchId>` recorded ATOMICALLY in the commit marker
  * (the marker IS the commit — there is no window where the merge is
  * applied but unrecorded), and the handler consults
  * [[graft.sources.v2.KvTable.committedTxns]] before merging. SQL
  * MERGE has no per-command write options, so the tag rides the
  * session conf `graft.kv.txn`, set around the command (the
  * single-maintainer assumption every maintained layout here makes).
  *
  * Contract notes:
  *   - `streamId` names the LOGICAL stream: restarting from a fresh
  *     checkpoint restarts batch ids at 0, so a fresh checkpoint MUST
  *     use a new streamId (same contract as Delta's txnAppId);
  *   - within a batch, multiple ops per key collapse to the HIGHEST
  *     `ver` before the merge (CDC logs are LSN-ordered; MERGE itself
  *     refuses duplicate source keys), deterministically;
  *   - apply semantics per collapsed record: `D` deletes if present
  *     (no-op otherwise), anything else upserts EVERY data column the
  *     batch carries beyond (ver, op, id) — so an evolved table's
  *     widened CDC feed (q241's `withExt`) replicates its evolved
  *     columns too; a classic five-column feed upserts (name, value)
  *     exactly as before. Standard CDC apply, last writer wins across
  *     batches. The target must already carry every data column the
  *     batch does (the replicator ALTERs the replica when the feed
  *     widens — q242).
  */
object KvCdcSink {

  /** Curry stream identity + target, hand the rest to
    * `writeStream.foreachBatch(KvCdcSink.cdcUpsertHandler(id, t, dir) _)`
    * — or call directly with explicit batch ids (the batch twin q224
    * registers; a handler is just a `(DataFrame, Long) => Unit`).
    *
    * @param streamId logical stream name (letters/digits/_ only — it
    *                 becomes part of a temp-view name and the txn tag)
    * @param target   SQL-addressable kv table (`catalog.table`)
    * @param tableDir the table's directory (for the txn ledger read)
    */
  def cdcUpsertHandler(streamId: String, target: String, tableDir: String)
      (batch: DataFrame, batchId: Long): Unit = {
    require(streamId.matches("[A-Za-z0-9_]+"),
      s"streamId must be [A-Za-z0-9_]+, got '$streamId'")
    val s = batch.sparkSession
    val txn = s"$streamId/$batchId"
    if (graft.sources.v2.KvTable.committedTxns(Paths.get(tableDir))
        .contains(txn)) return // crash-redelivery: batch already landed
    // collapse to the highest ver per key — payload struct is
    // ver-FIRST, so max() is the LSN order with deterministic field-
    // wise tie-break on (op, name, value) for byte-identical replays
    val payload = batch.columns.filterNot(_ == "id").toSeq
    require(payload.headOption.contains("ver") && payload.contains("op"),
      s"CDC batch needs (ver, op, id, …) columns, got ${batch.columns.mkString(",")}")
    val view = s"kv_cdc_${streamId}_src"
    batch.groupBy("id")
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col("id") +: payload.map(c => col(s"__p.$c").as(c)): _*)
      .createOrReplaceTempView(view)
    // every data column the batch carries (name, value, and any
    // evolved columns riding a widened q241 feed) upserts
    val dataCols = payload.filterNot(c => c == "ver" || c == "op")
    s.conf.set("graft.kv.txn", txn)
    try s.sql(
      s"""MERGE INTO $target t USING $view s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET
         |  ${dataCols.map(c => s"$c = s.$c").mkString(", ")}
         |WHEN NOT MATCHED AND s.op <> 'D' THEN
         |  INSERT (id, ${dataCols.mkString(", ")})
         |  VALUES (s.id, ${dataCols.map("s." + _).mkString(", ")})
         |""".stripMargin)
    finally s.conf.unset("graft.kv.txn")
  }
}
