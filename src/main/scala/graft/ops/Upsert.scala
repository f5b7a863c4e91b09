package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC compaction — MERGE-INTO semantics expressed as one keyed window:
  * union the base snapshot with the change log, keep the newest version
  * per key, and drop keys whose winning row is a tombstone. This is the
  * keep-latest upsert every warehouse ingestion needs (the reference
  * loads with WRITE_TRUNCATE — full replace per run, see
  * `scripts/load_to_bq.py:38,113` — which is exactly the pattern that
  * stops scaling: at 100 TB you compact incrementally instead of
  * rewriting the table).
  *
  * Scale shape: exactly ONE shuffle, hash-partitioned by the merge key —
  * `row_number` over (key / version desc) computes per-key maxima without
  * any self-join or driver state. Deletes ride the same log as upserts
  * (a tombstone is just a version that wins and then filters out), so
  * late-arriving updates below a tombstone's version are correctly
  * discarded. The version ordering MUST be total per key (pass a
  * tiebreaker column) or "latest" is nondeterministic.
  */
object Upsert {

  /** Newest version per key from a single change log. */
  def keepLatest(changes: DataFrame, keys: Seq[String],
                 ordering: Seq[Column]): DataFrame = {
    require(!changes.columns.contains("__rn"),
      "input already contains the reserved __rn column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge a base snapshot with a change log: per key the newest row wins
    * (base rows compete with their own versions — a change older than the
    * snapshot's row does not regress it); keys whose winner satisfies
    * `isTombstone` disappear from the result.
    */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
            ordering: Seq[Column], isTombstone: Column): DataFrame =
    keepLatest(base.unionByName(changes), keys, ordering)
      .filter(!isTombstone)
}
