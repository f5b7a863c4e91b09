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
  * replays and re-batching. This is the LOW-LATENCY EAGER gate: it
  * emits in the batch the arrival lands in; for out-of-order keys the
  * admitted representative is therefore slicing-dependent (an emitted
  * row cannot be recalled when an earlier-timestamped late arrival
  * shows up in a later batch). When exact re-batching invariance for
  * out-of-order-within-watermark data is required, use the
  * WATERMARK-BUFFERED twin [[TtlDedupBufferedProcessor]] ([[TtlDedup.firstSeenBuffered]]),
  * which holds candidates until their window closes under the
  * watermark and emits exactly the q209 batch-twin chain. The
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

/** WATERMARK-BUFFERED TTL first-seen gate — the slicing-INDEPENDENT
  * twin of [[TtlDedupProcessor]]: candidates buffer per key until the
  * watermark passes their admission window's END, then the greedy
  * admission chain finalizes with the EVENT-TIME-MINIMUM representative
  * and the COMPLETE suppression count — so the output is EXACTLY the
  * q209 batch twin's chain over every closed window, identical under
  * ANY slicing of the same keyed arrivals into micro-batches, in-order
  * or not (within the watermark). The price is latency: an admission
  * emits when `admit_ts + ttl ≤ watermark`, not in the batch it arrived
  * in — the standard windowed-aggregate trade, chosen here explicitly.
  *
  * Mechanics: pending candidate timestamps live in a ListState (only
  * arrivals ≥ the last FINALIZED window's expiry are buffered — an
  * arrival below it would be later than the watermark that closed that
  * window, which event-time semantics already dropped). Finalization
  * walks the sorted pending chain and emits every window whose end the
  * watermark has passed; the first still-open window and everything
  * after it stay buffered (its suppression count may still grow). An
  * event-time timer at `min(pending) + ttl` — which IS the next
  * window's close, since pending restarts the chain — guarantees idle
  * keys finalize without new arrivals; spurious timers from superseded
  * registrations are harmless because finalization is idempotent.
  *
  * Scale: state is the open windows' candidates only (bounded by TTL ×
  * per-key arrival rate, RocksDB-backed); each batch shuffles only its
  * own keys; finalization is one sorted pass per touched key.
  */
final class TtlDedupBufferedProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, KeyedArrival, FirstSeen] {

  @transient private var pending: org.apache.spark.sql.streaming.ListState[Long] = _
  /** Expiry of the last FINALIZED (emitted) admission. */
  @transient private var chainExpiry: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState[Long]("pending", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    chainExpiry = getHandle.getValueState[Long]("chainExpiry",
      Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  private def finalizeClosed(key: Long, wm: Long): Iterator[FirstSeen] = {
    val cs = pending.get().toArray
    if (cs.isEmpty) return Iterator.empty
    java.util.Arrays.sort(cs)
    val out = scala.collection.mutable.ArrayBuffer.empty[FirstSeen]
    var exp = if (chainExpiry.exists()) chainExpiry.get() else Long.MinValue
    var i = 0
    // finalize full windows the watermark has closed
    while (i < cs.length && cs(i) + ttlMs <= wm) {
      val admit = cs(i)
      val end = admit + ttlMs
      var supp = 0L
      i += 1
      while (i < cs.length && cs(i) < end) { supp += 1L; i += 1 }
      out += FirstSeen(key, new Timestamp(admit), supp)
      exp = end
    }
    if (out.nonEmpty) {
      chainExpiry.update(exp)
      val rest = cs.drop(i)
      if (rest.isEmpty) {
        pending.clear()
        // STATE BOUND: the chain drained — schedule the key's LAST
        // state (chainExpiry) for clearing. The timer fires in a later
        // batch, whose late-event watermark is ≥ this batch's eviction
        // watermark ≥ exp, so no arrival below exp can be admitted
        // from then on and the ValueState is no longer needed; without
        // this, every key ever seen would retain a row forever
        getHandle.registerTimer(exp)
      } else pending.put(rest)
    }
    if (i < cs.length) getHandle.registerTimer(cs(i) + ttlMs)
    out.iterator
  }

  override def handleInputRows(key: Long, rows: Iterator[KeyedArrival],
      timers: TimerValues): Iterator[FirstSeen] = {
    val exp0 = if (chainExpiry.exists()) chainExpiry.get() else Long.MinValue
    rows.foreach { r =>
      val t = r.ts.getTime
      if (t >= exp0) pending.appendValue(t)
    }
    finalizeClosed(key, timers.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FirstSeen] = {
    val out = finalizeClosed(key, timers.getCurrentWatermarkInMs())
    // state hygiene (mirrors the eager twin's cleanup timer): once the
    // chain has no pending candidates and this timer has reached the
    // finalized expiry, the key's ValueState goes — a superseded
    // timer (chainExpiry advanced past its registration) is ignored,
    // as is one racing a still-open chain (pending non-empty)
    if (chainExpiry.exists() &&
        chainExpiry.get() <= expired.getExpiryTimeInMs() &&
        !pending.get().hasNext)
      chainExpiry.clear()
    out
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

  /** Wire the watermark-buffered (slicing-independent) gate — see
    * [[TtlDedupBufferedProcessor]] for the latency/invariance trade. */
  def firstSeenBuffered(s: SparkSession, arrivals: Dataset[KeyedArrival],
      watermark: String, ttlMs: Long): Dataset[FirstSeen] = {
    import s.implicits._
    arrivals
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .transformWithState(new TtlDedupBufferedProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
