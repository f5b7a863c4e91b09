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
  * arrival is admitted (with the count of same-batch arrivals its
  * window suppresses) and the key's EXPIRY (`first_ts + ttl`) is
  * stored in state; arrivals before the expiry are suppressed, an
  * arrival at or after it is admitted as "first" again. Admission is decided by
  * comparing EVENT TIMES against the stored expiry — never by whether
  * a timer happened to fire yet — so for PER-KEY IN-ORDER arrival the
  * admission sequence is a pure function of the data and survives
  * replays and re-batching. For out-of-order data within the watermark
  * the sequence is slicing-dependent: a late arrival landing in a
  * LATER micro-batch than a larger same-key timestamp may pick a
  * different admitted representative / suppression count than
  * single-batch slicing would (a batch-local sort cannot see
  * cross-batch order) — no duplicates or losses arise, but exact
  * invariance under re-batching requires in-order keys (or buffering
  * candidates until the watermark; see the batch twin
  * [[graft.queries.LlmOps]] q209, which IS the watermark-complete
  * answer). The
  * event-time timer exists only to CLEAR expired state (bounding the
  * store); a stale timer from a superseded admission checks the stored
  * expiry before clearing. This is the continual-ingest "seen this
  * content hash recently?" gate: q26's exact dedup as a stream whose
  * state is BOUNDED by the TTL window instead of growing with the
  * corpus (the complementary posture to [[IncrementalIndex]]'s
  * monotone index).
  *
  * Scale: state is per-key-in-window (RocksDB spills beyond memory);
  * each micro-batch shuffles only its own keys — the 1000-executor
  * posture is the state store's, not a join's. Per-key batch handling
  * is one iterator pass, no materialization.
  */
final class TtlDedupProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, KeyedArrival, FirstSeen] {

  /** Stored value: the live admission's expiry (first_ts + ttl). */
  @transient private var expiry: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    expiry = getHandle.getValueState[Long]("expiry", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedArrival],
      timers: TimerValues): Iterator[FirstSeen] = {
    val live = if (expiry.exists()) expiry.get() else Long.MinValue
    // one pass keeping only candidates at/after the live expiry —
    // arrivals inside the live window are suppressed by the previous
    // admission and need no buffering (the common hot-key path)
    val cand = scala.collection.mutable.ArrayBuilder.make[Long]
    rows.foreach { r =>
      val t = r.ts.getTime
      if (t >= live) cand += t
    }
    val cs = cand.result()
    if (cs.isEmpty) return Iterator.empty
    // greedy admission chain over the sorted candidates, so the result
    // is identical however arrivals are sliced into micro-batches; a
    // batch spanning more than one TTL admits once per window.
    // n_suppressed = same-batch arrivals inside that admission's window
    java.util.Arrays.sort(cs)
    val out = scala.collection.mutable.ArrayBuffer.empty[FirstSeen]
    var exp = Long.MinValue
    var admitTs = 0L
    var supp = 0L
    cs.foreach { t =>
      if (t >= exp) {
        if (exp != Long.MinValue)
          out += FirstSeen(key, new Timestamp(admitTs), supp)
        admitTs = t; exp = t + ttlMs; supp = 0L
      } else supp += 1L
    }
    out += FirstSeen(key, new Timestamp(admitTs), supp)
    expiry.update(exp)
    getHandle.registerTimer(exp) // state-cleanup only
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FirstSeen] = {
    // clear only if this timer belongs to the CURRENT admission — a
    // stale timer from a superseded admission must not re-open the key
    if (expiry.exists() && expiry.get() <= expired.getExpiryTimeInMs())
      expiry.clear()
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
