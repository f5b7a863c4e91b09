package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** A content-key event entering the TTL dedup gate. */
final case class KeyedArrival(key: Long, ts: Timestamp)

/** The gate's output: one row per ADMITTED key occurrence. */
final case class FirstSeen(key: Long, first_ts: Timestamp, n_suppressed: Long)

/** TTL first-seen gate on the `transformWithState` API (Spark 4's
  * arbitrary-stateful-processing v2, RocksDB-backed): a key's FIRST
  * arrival is admitted (with the count of same-batch repeats it
  * suppressed), later arrivals are suppressed while the key's state
  * lives, and an event-time TIMER at `first_ts + ttl` clears the state
  * when the watermark passes it — so a re-arrival after the TTL is
  * admitted again. This is the continual-ingest "seen this content hash
  * recently?" gate: q26's exact dedup as a stream whose state is
  * BOUNDED by the TTL window instead of growing with the corpus (the
  * complementary posture to [[IncrementalIndex]]'s monotone index).
  *
  * Event-time timers (not `TTLConfig`'s processing-time TTL) keep
  * expiry DETERMINISTIC: the watermark — derived from the data — is the
  * clock, so replays and tests observe identical admissions.
  *
  * Scale: state is per-key-in-window (RocksDB spills beyond memory);
  * each micro-batch shuffles only its own keys — the 1000-executor
  * posture is the state store's, not a join's.
  */
final class TtlDedupProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, KeyedArrival, FirstSeen] {

  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedArrival],
      timers: TimerValues): Iterator[FirstSeen] = {
    val batch = rows.toSeq
    if (seen.exists()) {
      Iterator.empty // suppressed: key is live in the window
    } else {
      val first = batch.minBy(_.ts.getTime)
      seen.update(1L)
      getHandle.registerTimer(first.ts.getTime + ttlMs)
      Iterator.single(
        FirstSeen(key, first.ts, batch.length - 1L))
    }
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FirstSeen] = {
    seen.clear() // TTL elapsed: the next arrival is "first" again
    Iterator.empty
  }
}

object TtlDedup {
  /** Wire the gate over a watermarked arrival stream. `ttl` is a
    * calendar string ("10 minutes"). */
  def firstSeen(s: SparkSession, arrivals: Dataset[KeyedArrival],
      watermark: String, ttlMs: Long): Dataset[FirstSeen] = {
    import s.implicits._
    arrivals
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .transformWithState(new TtlDedupProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
