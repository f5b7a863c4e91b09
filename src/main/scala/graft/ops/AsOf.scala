package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF joins — the time-series operator Spark has no built-in for
  * (brief: compose existing ops when semantics allow, before reaching
  * for a custom plan). Backward: each left row is enriched with the
  * payload of the most recent right row with the same keys and `ts` ≤
  * left.`ts` (inclusive); forward: the earliest right row with `ts` ≥
  * left.`ts`. Nulls when none exists (left-join semantics — DuckDB's
  * `ASOF LEFT JOIN`, the oracle engine for q48/q58).
  *
  * Construction: tag the sides, `unionByName` (right-side tag sorts FIRST
  * on ts ties so an equal-timestamp right row is visible to the left row
  * — the inclusive bound), then one window per key group ordered by
  * (ts, side) carrying the last non-null right payload forward; keep only
  * left rows. Scale shape: ONE shuffle on the keys + a sort within
  * partitions — no range-condition join (which Spark would plan as a
  * broadcast nested loop), no per-key driver loop; state is one carried
  * payload per window frame. Right rows must be unique per (keys, ts) —
  * pre-aggregate the right side otherwise (ties inside the right table
  * would make "the most recent row" ambiguous in ANY engine).
  */
object AsOf {

  /** `payload` = right columns to carry (must not collide with left
    * column names); all other right columns must be exactly `keys :+ ts`.
    */
  def joinBackward(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val collisions = payload.intersect(left.columns.toSeq)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")

    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Forward (look-ahead) twin: each left row gets the EARLIEST right row
    * with the same keys and `ts` ≥ left.`ts` (inclusive). Same one-shuffle
    * construction, mirrored: left tags sort BEFORE right tags on a ts tie
    * so an equal-timestamp right row is inside the look-ahead frame, and
    * the window carries the FIRST non-null payload from the current row
    * forward instead of the last one backward.
    */
  def joinForward(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val collisions = payload.intersect(left.columns.toSeq)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")

    val l = left.withColumn("__side", lit(0))
    val r = right.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0).drop("__side")
  }
}
