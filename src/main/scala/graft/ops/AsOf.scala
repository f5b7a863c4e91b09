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
  * Construction: pack the right payload into ONE struct (non-null for
  * every right row even when individual payload FIELDS are null — so a
  * matched right row whose value is legitimately NULL is carried as that
  * null, never skipped in favor of an older/newer row, and multi-column
  * payloads always come from the SAME right row), tag the sides,
  * `unionByName` (right-side tag sorts FIRST on ts ties so an
  * equal-timestamp right row is visible to the left row — the inclusive
  * bound), then one window per key group ordered by (ts, side) carrying
  * the last non-null struct forward; keep only left rows and unpack.
  * Scale shape: ONE shuffle on the keys + a sort within partitions — no
  * range-condition join (which Spark would plan as a broadcast nested
  * loop), no per-key driver loop; state is one carried struct per window
  * frame, and the carry is a single window expression regardless of
  * payload width. Right rows must be unique per (keys, ts) —
  * pre-aggregate the right side otherwise (ties inside the right table
  * would make "the most recent row" ambiguous in ANY engine).
  */
object AsOf {

  private val Reserved = Seq("__side", "__pay")

  private def checkColumns(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String): Seq[String] = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val collisions = payload.intersect(left.columns.toSeq)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")
    val reservedHits = (left.columns ++ right.columns).toSeq.intersect(Reserved)
    require(reservedHits.isEmpty,
      s"inputs may not contain reserved internal columns: ${reservedHits.distinct}")
    payload
  }

  /** `payload` = right columns to carry (must not collide with left
    * column names); all other right columns must be exactly `keys :+ ts`.
    */
  def joinBackward(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String): DataFrame = {
    val payload = checkColumns(left, right, keys, ts)

    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keys :+ ts).map(col) :+ struct(payload.map(col): _*).as("__pay"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        payload.map(c => col(s"__pay.$c").as(c)): _*)
  }

  /** Forward (look-ahead) twin: each left row gets the EARLIEST right row
    * with the same keys and `ts` ≥ left.`ts` (inclusive). Same one-shuffle
    * construction, mirrored: left tags sort BEFORE right tags on a ts tie
    * so an equal-timestamp right row is inside the look-ahead frame, and
    * the window carries the FIRST non-null struct from the current row
    * forward instead of the last one backward.
    */
  def joinForward(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String): DataFrame = {
    val payload = checkColumns(left, right, keys, ts)

    val l = left.withColumn("__side", lit(0))
    val r = right
      .select((keys :+ ts).map(col) :+ struct(payload.map(col): _*).as("__pay"): _*)
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__pay", first(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(left.columns.toSeq.map(col) ++
        payload.map(c => col(s"__pay.$c").as(c)): _*)
  }
}
