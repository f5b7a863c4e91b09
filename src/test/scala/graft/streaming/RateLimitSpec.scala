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

  test("ceiling horizon: refillTokens>1 with R ∤ C·P refills an idle bucket to FULL") {
    // C=5, R=3, P=1s (R ∤ C·P·10⁶? — what matters is R ∤ C·P in µs:
    // 5·10⁶/3 is not integral). H must be ⌈5·10⁶/3⌉ = 1666667 µs; a
    // floored horizon (1666666) refills a DRAINED key to 4999998 µtok
    // and admits only 4 of a 5-burst. Drain exactly to 0 with five
    // same-µs arrivals (gap 0 → refill 0), idle ≥ H, then a 6-burst:
    // the first five must pass (bucket back at FULL), the sixth drops.
    val Sec = 1000000L
    // ms-granularity arrivals (Timestamp(ms)); the 6-burst spaces 1 ms
    // apart — each gap refills only 3000 µtok, far below one token
    def ts(us: Long): Timestamp = new Timestamp(us / 1000L)
    val burst = Seq.fill(5)(KeyedArrival(7, ts(10 * Sec))) ++
      (0L until 6L).map(i => KeyedArrival(7, ts(100 * Sec + i * 1000L)))
    val input = MemoryStream[KeyedArrival]
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gate = RateLimit.admit(spark, input.toDS(), "0 seconds",
        capacity = 5L, refillTokens = 3L, refillPeriodUs = Sec)
      val q = gate.writeStream.format("memory")
        .queryName("rl_ceil").outputMode("append").start()
      try {
        input.addData(burst); q.processAllAvailable()
        val times = spark.table("rl_ceil").as[Admitted].collect()
          .filter(_.key == 7L)
          .map(a => a.ts.getTime * 1000L + (a.ts.getNanos / 1000L) % 1000L)
          .sorted
        // five t=10s admissions drain to 0 µtok; idle 90s ≥ H refills
        // to FULL 5 (floored horizon stops at 4999998 → 9 admissions);
        // the first five of the 6-burst admit, the sixth drops.
        assert(times.length == 10,
          s"expected 10 admissions (drained 5 + refilled 5), got ${times.length}")
        assert(times.last == 100 * Sec + 4000L)
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

  test("live fixture parity: MemoryStream vs the q218 batch core over events") {
    // the q218 configuration (3-token burst, 1 token/day) over the real
    // sf0.001 events fixture, streamed in-order across 7 micro-batches —
    // per-key admission counts AND the mod-p admitted-time checksum must
    // equal the registered batch core's (which the DuckDB oracle gates)
    val d = "/root/testdata/sf0.001"
    val Day = 24L * 3600L * 1000000L
    val Mod = 1000000007L
    val arrivals = graft.Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.col("user_id").as("key"),
        org.apache.spark.sql.functions.col("ts"))
      .as[KeyedArrival].collect().toSeq
      .sortBy(a => (a.ts.getTime, a.ts.getNanos))
    val expect = graft.queries.LlmOps.rateLimitStats(
        graft.Tables.events(spark, d).select(
          org.apache.spark.sql.functions.col("user_id").as("key"),
          org.apache.spark.sql.functions.col("ts")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedArrival]
      val gate = RateLimit.admit(spark, input.toDS(), "0 seconds",
        capacity = 3L, refillTokens = 1L, refillPeriodUs = Day)
      val q = gate.writeStream.format("memory")
        .queryName("rl_fixture").outputMode("append").start()
      try {
        arrivals.grouped(math.max(1, arrivals.size / 7)).foreach { s =>
          input.addData(s); q.processAllAvailable()
        }
        val got = spark.table("rl_fixture").as[Admitted].collect()
          .groupBy(_.key).view.mapValues { as =>
            val n = as.length.toLong
            val cksum = as.foldLeft(0L) { (acc, a) =>
              val us = a.ts.getTime * 1000L + (a.ts.getNanos / 1000L) % 1000L
              (acc + java.lang.Math.floorMod(us, Mod)) % Mod
            }
            (n, cksum)
          }.toMap
        assert(got == expect,
          s"streamed admissions diverge from the oracled batch core on " +
            s"${got.keySet.union(expect.keySet).count(k => got.get(k) != expect.get(k))} keys")
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
