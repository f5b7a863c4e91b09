package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The token-bucket limiter: burst admission, sustained-excess drops,
  * refill arithmetic, and EXACT stream/batch parity under any in-order
  * slicing (the full decision state carries in the store — the
  * contrast with TtlDedup's same-batch suppression counts).
  */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val Hour = 3600L * 1000000L

  private def t(min: Long): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  // capacity 2, 1 token/hour: burst of 2 passes, the 3rd drops, one
  // token refills by +60min, two-hour gap refills both (capped at 2)
  private val arrivals = Seq(
    KeyedArrival(1, t(0)), KeyedArrival(1, t(1)), KeyedArrival(1, t(2)),
    KeyedArrival(1, t(62)), KeyedArrival(1, t(63)),
    KeyedArrival(1, t(200)), KeyedArrival(1, t(201)), KeyedArrival(1, t(202)),
    KeyedArrival(2, t(5)))
  // key 1 walk: t0 admit (1 left), t1 admit (0), t2 DROP, t62 refill
  // 1 -> admit (0), t63 DROP, t200 refill capped at 2 -> admit (1),
  // t201 admit (0), t202 DROP  => 5 admitted, 3 dropped
  private val expectedAdmitted = Set(
    (1L, t(0)), (1L, t(1)), (1L, t(62)), (1L, t(200)), (1L, t(201)),
    (2L, t(5)))

  private def streamed(slices: Seq[Seq[KeyedArrival]], name: String)
      : Set[(Long, Timestamp)] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedArrival]
      val gate = RateLimit.admit(spark, input.toDS(), "0 seconds",
        capacity = 2L, refillTokens = 1L, refillPeriodUs = Hour)
      val q = gate.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        slices.foreach { s => input.addData(s); q.processAllAvailable() }
        spark.table(name).as[Admitted].collect()
          .map(a => (a.key, a.ts)).toSet
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("burst, drop, refill, and cap — hand-computed admissions") {
    assert(streamed(Seq(arrivals), "rl_one") == expectedAdmitted)
  }

  test("in-order re-batching is EXACTLY invariant (full state carries)") {
    val sliced = streamed(
      arrivals.sortBy(_.ts.getTime).grouped(2).toSeq, "rl_many")
    assert(sliced == expectedAdmitted)
  }

  test("batch twin agrees arrival-for-arrival (counts + admitted-time checksum)") {
    // the q218 core at the spec's (2, 1/hour) configuration via a
    // direct fold replay of the same recurrence
    val Mu = 1000000L
    val byKey = arrivals.groupBy(_.key).view.mapValues(
      _.map(a => a.ts.getTime * 1000L).sorted).toMap
    val replay = byKey.map { case (k, ts) =>
      var mutok = 2L * Mu; var tPrev = Long.MinValue; var adm = 0
      ts.foreach { x =>
        if (tPrev != Long.MinValue)
          mutok = math.min(2L * Mu, mutok + math.min(x - tPrev, 2L * Hour) * Mu / Hour)
        if (mutok >= Mu) { mutok -= Mu; adm += 1 }
        tPrev = x
      }
      k -> adm
    }
    val streamedCounts = streamed(Seq(arrivals), "rl_twin")
      .groupBy(_._1).view.mapValues(_.size).toMap
    assert(replay == streamedCounts)
  }
}
