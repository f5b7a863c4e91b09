package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape (SURVEY §7.5).
  * Each transform works unchanged on a batch OR streaming DataFrame —
  * that symmetry is the point of the Dataset API: the batch twin is what
  * the oracle checks (q32/q33/q39), the streaming twin is what
  * StreamingSpec / SessionizeSpec drive through MemoryStream.
  *
  * Scale posture: all state is keyed by high-cardinality keys (user_id),
  * watermarks bound state size, and nothing collects to the driver.
  */
object EventStreams {

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Tumbling-window counts with a watermark — works for batch and
    * streaming alike; in streaming append mode a window emits once the
    * watermark passes its end, and later (late) rows are dropped.
    */
  def windowedCounts(events: DataFrame, windowLen: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming-safe exact dedup: state bounded by the watermark horizon. */
  def dedupEvents(events: DataFrame, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay).dropDuplicates("event_id")

  /** STREAM-STREAM interval join: attribute each purchase to every click
    * by the same user in the preceding `maxLag` — the canonical two-stream
    * correlation (ad attribution, cause→effect pairing). The equi-key
    * (user_id) plus the two-sided event-time range condition is exactly
    * what Structured Streaming needs to bound join state: each side's
    * watermark lets the engine drop buffered rows once no future match can
    * land in the interval. Batch-wise the same expression is a hash
    * equi-join on user_id with a range post-filter — never a nested loop.
    *
    * Inputs must carry (user_id, click_id, click_ts) / (p_user,
    * purchase_id, purchase_ts, value); the purchase user column arrives
    * renamed so self-join column ambiguity never arises (the two sides
    * usually derive from the SAME source, split by event_type).
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      maxLag: String, watermarkDelay: String): DataFrame =
    clicks.withWatermark("click_ts", watermarkDelay)
      .join(purchases.withWatermark("purchase_ts", watermarkDelay),
        col("user_id") === col("p_user") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxLag"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"),
        col("value"))

  /** STREAM-STREAM LEFT-OUTER interval join — the shape
    * [[attributionJoin]] cannot express: every click appears exactly
    * once per matching purchase AND once with nulls if NOTHING matched,
    * so conversion and non-conversion ride one result stream (funnel
    * drop-off, abandoned carts). Outer stream-stream joins are where
    * watermark state-eviction is LOAD-BEARING, not just an optimization:
    * the engine can only emit the null-padded row once the left row's
    * buffered state expires — both watermarks plus the two-sided time
    * range bound that expiry, so unmatched clicks surface after
    * (click_ts + maxLag + watermarkDelay) passes, never earlier and
    * never lost. Batch-wise the same expression is a plain left outer
    * hash join, which is the oracle (q199's registration).
    *
    * Output adds `unconverted` (1 for the null-padded rows) so a
    * downstream count needs no null inspection.
    */
  def attributionJoinOuter(clicks: DataFrame, purchases: DataFrame,
                           maxLag: String, watermarkDelay: String): DataFrame =
    clicks.withWatermark("click_ts", watermarkDelay)
      .join(purchases.withWatermark("purchase_ts", watermarkDelay),
        col("user_id") === col("p_user") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxLag"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        when(col("purchase_id").isNotNull,
          unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"),
        col("value"),
        col("purchase_id").isNull.cast("int").cast("long").as("unconverted"))

  /** Gap-based sessionization with EXPLICIT state — the
    * flatMapGroupsWithState formulation (KeyValueGroupedDataset custom
    * state per SURVEY §7.5). A session closes either when a later event
    * arrives beyond the gap (emitted in that batch) or when the event-time
    * watermark passes lastTs + gap (emitted via timeout) — so quiet users'
    * sessions still complete and state cannot grow unboundedly.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def close(s: SessionState): SessionOut =
            SessionOut(user, new Timestamp(s.sessionStart), new Timestamp(s.lastTs), s.nEvents)
          if (state.hasTimedOut) {
            val out = close(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  Some(s.copy(lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= close(s)
                  Some(SessionState(t, t, 1))
                case None =>
                  Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT drop late input, so a late
              // event can leave lastTs + gap at or below the current
              // watermark — an un-clamped timeout throws and fails the whole
              // query. Clamp to watermark + 1 ms: the session then times out
              // at the first opportunity, which is the correct semantics for
              // a session that already ended before the watermark.
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-(user, day) growth classification for a stream. */
  final case class DayClass(user_id: Long, epoch_day: Long, cls: String)

  /** Per-user growth state: first and most recent active epoch day. */
  final case class GrowthState(firstDay: Long, lastDay: Long)

  /** Streaming growth accounting — the incremental twin of the batch
    * ledger (`queries/Warehouse.q170GrowthAccounting`): every first
    * activity of a (user, day) is classified new / retained /
    * resurrected AT ARRIVAL from 16 bytes of per-user state (first +
    * last active epoch day), so the daily DAU decomposition is a
    * streaming aggregation over this output instead of a nightly
    * rescan of the whole activity log. Same-day repeats emit nothing
    * (the day is already classified); a day arriving at or before the
    * user's recorded lastDay is late data already accounted for and is
    * dropped — day-level ordering per user is the contract (the
    * upstream watermark bounds how out-of-order days can be).
    *
    * State is user-keyed and constant-size — at 10⁹ users it is tens
    * of GB across executors, the same class of footprint as the
    * sessionizer above. NoTimeout: lifecycle state must outlive any
    * watermark horizon by definition (a resurrection IS a long gap);
    * a production deployment would bolt on an inactivity TTL policy
    * when "churned forever" users may be forgotten.
    *
    * CONTRACT — UTC sessions only: epoch_day is the UTC calendar day
    * (`floorDiv(epochMillis, 86400000)`), while the batch twin's
    * `to_date(ts)` follows `spark.sql.session.timeZone`. The two
    * ledgers agree iff the session time zone is UTC (as this library's
    * sessions pin); a non-UTC caller must either set the session to
    * UTC or accept that day boundaries differ by the zone offset.
    */
  def growthAccounting(
      spark: SparkSession, events: Dataset[Event]): Dataset[DayClass] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GrowthState, DayClass](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[GrowthState]) =>
          val days = rows.map(e => Math.floorDiv(e.ts.getTime, 86400000L))
            .toSeq.distinct.sorted
          var st = state.getOption
          val out = List.newBuilder[DayClass]
          days.foreach { d =>
            st match {
              case None =>
                out += DayClass(user, d, "new")
                st = Some(GrowthState(d, d))
              case Some(s) if d > s.lastDay =>
                out += DayClass(user, d,
                  if (d == s.lastDay + 1) "retained" else "resurrected")
                st = Some(s.copy(lastDay = d))
              case _ => // same-day repeat or late data: already classified
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
