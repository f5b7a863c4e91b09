package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Token-bucket state: micro-tokens (tokens × 10⁶) and the last
  * arrival's event time in epoch-µs. */
final case class BucketState(mutok: Long, tPrevUs: Long)

/** An admitted arrival (the gate's output). */
final case class Admitted(key: Long, ts: Timestamp)

/** PER-KEY TOKEN-BUCKET RATE LIMITER on `transformWithState` — the
  * second continual-ingest gate beside [[TtlDedup]]: where the TTL gate
  * asks "seen this key recently?", the rate limiter asks "is this key
  * PRODUCING TOO FAST?" — the per-source/per-tenant admission control a
  * crawl or event ingest runs against hot producers (bot storms, stuck
  * clients, scraper bursts). A key holds `capacity` tokens; each
  * admission spends one; tokens refill at `refillTokens` per
  * `refillPeriodUs`. Bursts up to `capacity` pass, sustained excess is
  * dropped deterministically.
  *
  * EXACT INTEGER arithmetic end-to-end (micro-tokens): the refill for
  * an inter-arrival gap Δµs is `min(Δ, H)·10⁶·R DIV P` with
  * H = ⌈C·P / R⌉ the full-refill horizon — the CEILING matters: with a
  * floored H, any (C, P, R) where R ∤ C·P under-refills a fully idle
  * bucket (e.g. C=5, R=3, P=1s floors H to 1666666 µs and an idle key
  * refills to 4999998 < 5·10⁶ µtokens, admitting only 4 of a 5-burst).
  * With the ceiling, H·R ≥ C·P so a gap ≥ H floors to ≥ C·10⁶ and the
  * `min(capacity·10⁶, ·)` cap lands exactly full, while sub-horizon
  * gaps are unclamped and therefore unchanged. The product is bounded
  * at ~C·P·10⁶ ≲ 10¹⁶, far inside long range for any real
  * configuration. Admission compares EVENT TIMES only, never
  * processing time, so — unlike [[TtlDedup]]'s same-batch suppression
  * counts — the decision SEQUENCE is carried fully in state
  * (mutok, tPrev) and is EXACTLY invariant under any in-order
  * re-batching; the batch twin (q218) is the single-batch fold of the
  * same recurrence.
  *
  * Scale: state is two longs per live key (RocksDB-backed); each
  * micro-batch shuffles only its own keys; per-key handling is one
  * sorted pass over the batch's arrivals.
  */
final class RateLimitProcessor(capacity: Long, refillTokens: Long,
    refillPeriodUs: Long)
    extends StatefulProcessor[Long, KeyedArrival, Admitted] {

  private val Mu = 1000000L
  private val horizonUs =
    (capacity * refillPeriodUs + refillTokens - 1) / refillTokens

  @transient private var state: ValueState[BucketState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[BucketState]("bucket",
      Encoders.product[BucketState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedArrival],
      timers: TimerValues): Iterator[Admitted] = {
    // full µs precision: getTime carries millis, getNanos the sub-ms
    val ts = rows.map { r =>
      r.ts.getTime * 1000L + (r.ts.getNanos / 1000L) % 1000L
    }.toArray
    java.util.Arrays.sort(ts)
    var (mutok, tPrev) =
      if (state.exists()) { val s = state.get(); (s.mutok, s.tPrevUs) }
      else (capacity * Mu, Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
    ts.foreach { t =>
      if (tPrev != Long.MinValue) {
        val dc = math.min(t - tPrev, horizonUs)
        mutok = math.min(capacity * Mu,
          mutok + dc * Mu * refillTokens / refillPeriodUs)
      }
      if (mutok >= Mu) {
        mutok -= Mu
        val stamp = new Timestamp(t / 1000L)
        stamp.setNanos(((t % 1000000L) * 1000L).toInt)
        out += Admitted(key, stamp)
      }
      tPrev = t
    }
    state.update(BucketState(mutok, tPrev))
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Admitted] = Iterator.empty
}

object RateLimit {
  /** Wire the limiter over a watermarked arrival stream. */
  def admit(s: SparkSession, arrivals: Dataset[KeyedArrival],
      watermark: String, capacity: Long, refillTokens: Long,
      refillPeriodUs: Long): Dataset[Admitted] = {
    import s.implicits._
    arrivals
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .transformWithState(
        new RateLimitProcessor(capacity, refillTokens, refillPeriodUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
