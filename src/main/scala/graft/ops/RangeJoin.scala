package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lookback RANGE JOIN via time-binning — the interval operator Spark
  * would otherwise plan as a BroadcastNestedLoopJoin (the non-equi
  * condition leaves it no equi keys). Each left row is paired with every
  * right row sharing its keys whose timestamp falls in the half-open
  * window `[left.ts - lookback, left.ts)` — the attribution shape ("all
  * clicks in the 10 minutes before this purchase"); left rows with no
  * match survive with null payload (left-join semantics).
  *
  * Construction: quantize both sides' timestamps into bins of exactly
  * `lookback` microseconds. A half-open window of length == bin size can
  * only intersect the left row's own bin and the one before it, so the
  * left side explodes into exactly 2 probe rows, the join becomes a hash
  * EQUI-join on (keys..., bin), and the exact range predicate runs inside
  * the join condition. Each matching right row satisfies exactly one
  * probe bin, so matches are never duplicated; a final window keyed on
  * the left's unique id collapses the probe padding (unmatched probe rows)
  * back to exact left-join rows.
  *
  * Scale shape: one shuffle of each side on (keys, bin) for the join plus
  * one on `leftId` for the padding collapse — never the |left|×|right| of
  * a nested-loop plan; skewed keys spread across time bins by
  * construction. This is the standard bin-and-filter strategy for
  * interval joins (cf. Flink's interval join and Databricks' range-join
  * binning). An aggregate consumer grouping on `leftId` with
  * count(payload) may call [[candidates]] directly and skip the collapse
  * shuffle — the padding rows vanish inside its null-skipping aggregates.
  */
object RangeJoin {

  /** Matched pairs PLUS up to two null-payload probe rows per unmatched
    * left row — exact enough for null-skipping aggregates keyed on a
    * unique left column, one shuffle cheaper than [[lookback]]. Carries
    * the internal `__off` probe column, which [[lookback]] consumes.
    */
  def candidates(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    val overlap = right.columns.filterNot(keys.contains)
      .intersect(left.columns.filterNot(keys.contains))
    require(overlap.isEmpty, s"right columns collide with left: ${overlap.toSeq}")
    val reservedHits = (left.columns ++ right.columns).toSeq
      .intersect(Seq("__off", "__bin", "__n_matched"))
    require(reservedHits.isEmpty,
      s"inputs may not contain reserved internal columns: ${reservedHits.distinct}")

    val lBin = floor(unix_micros(col(leftTs)) / lookbackMicros)
    val rBin = floor(unix_micros(col(rightTs)) / lookbackMicros)

    // Subquery aliases + qualified refs: both sides often derive from the
    // SAME source (purchases vs clicks of one events table), and dataset
    // column refs across such a self-join collapse to the same attribute
    // (Spark warns "trivially true equals predicate") — qualified names
    // survive DeduplicateRelations.
    val probes = left
      .withColumn("__off", explode(array(lit(0L), lit(1L))))
      .withColumn("__bin", lBin - col("__off"))
      .alias("__rj_l")
    val binned = right.withColumn("__bin", rBin).alias("__rj_r")

    val cond = keys.map(k => col(s"__rj_l.$k") === col(s"__rj_r.$k"))
      .reduce(_ && _) &&
      col("__rj_l.__bin") === col("__rj_r.__bin") &&
      col(s"__rj_r.$rightTs") >=
        col(s"__rj_l.$leftTs") - expr(s"INTERVAL $lookbackMicros MICROSECONDS") &&
      col(s"__rj_r.$rightTs") < col(s"__rj_l.$leftTs")

    val leftOut = (left.columns.toSeq :+ "__off").map(c => col(s"__rj_l.$c"))
    val rightOut = right.columns.toSeq.filterNot(keys.contains)
      .map(c => col(s"__rj_r.$c"))
    probes.join(binned, cond, "left").select(leftOut ++ rightOut: _*)
  }

  /** Exact left-join rows: every left row at least once, matched rows
    * exactly once, no null padding next to matches. `leftId` must be
    * unique within `left`.
    */
  def lookback(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lookbackMicros: Long,
      leftId: String): DataFrame = {
    val cand = candidates(left, right, keys, leftTs, rightTs, lookbackMicros)
    val w = Window.partitionBy(col(leftId))
    cand
      .withColumn("__n_matched", count(col(rightTs)).over(w))
      .filter(col(rightTs).isNotNull ||
        (col("__n_matched") === 0 && col("__off") === 0))
      .drop("__n_matched", "__off")
  }
}
