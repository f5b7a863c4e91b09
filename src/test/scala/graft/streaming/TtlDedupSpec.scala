package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The transformWithState TTL gate: first arrival admitted with its
  * same-batch suppression count, repeats suppressed while state lives,
  * and the event-time timer re-opens the key after the TTL — all
  * watermark-driven, so the sequence is deterministic.
  */
class TtlDedupSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def t(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  test("first-seen admission, in-window suppression, TTL re-admission") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedArrival]
      val gate = TtlDedup.firstSeen(spark, input.toDS(),
        watermark = "0 seconds", ttlMs = 10 * 60_000L)
      val q = gate.writeStream.format("memory")
        .queryName("ttl_gate").outputMode("append").start()
      try {
        def emitted(): Seq[(Long, Timestamp, Long)] =
          spark.table("ttl_gate").as[FirstSeen].collect()
            .map(f => (f.key, f.first_ts, f.n_suppressed)).toSeq

        // batch 1: key 1 twice (one suppressed in-batch), key 2 once
        input.addData(KeyedArrival(1, t(0)), KeyedArrival(1, t(1)),
          KeyedArrival(2, t(0)))
        q.processAllAvailable()
        assert(emitted().toSet ==
          Set((1L, t(0), 1L), (2L, t(0), 0L)))

        // batch 2: key 1 again inside the window -> suppressed; key 3 new
        input.addData(KeyedArrival(1, t(5)), KeyedArrival(3, t(5)))
        q.processAllAvailable()
        assert(emitted().toSet ==
          Set((1L, t(0), 1L), (2L, t(0), 0L), (3L, t(5), 0L)))

        // advance the watermark past key 1's 10-minute timer (t0+10),
        // then past the expiry batch so the timer has actually fired
        input.addData(KeyedArrival(8, t(30)))
        q.processAllAvailable()
        input.addData(KeyedArrival(9, t(31)))
        q.processAllAvailable()

        // key 1 re-arrives after its TTL: admitted as first again —
        // WITHOUT a separate watermark-advancing batch first (admission
        // compares event time against the stored expiry, never "did the
        // cleanup timer fire yet", so batching cannot change the answer)
        input.addData(KeyedArrival(1, t(32)))
        q.processAllAvailable()
        assert(emitted().count { case (k, _, _) => k == 1L } == 2,
          s"key 1 should be re-admitted after TTL: ${emitted()}")
        assert(emitted().contains((1L, t(32), 0L)))

        // a single batch spanning two TTL windows admits once per
        // window (greedy chain): key 7 at t40, t45, t51 with ttl 10min
        input.addData(KeyedArrival(7, t(40)), KeyedArrival(7, t(45)),
          KeyedArrival(7, t(51)))
        q.processAllAvailable()
        assert(emitted().filter(_._1 == 7L).toSet ==
          Set((7L, t(40), 1L), (7L, t(51), 0L)),
          s"multi-window batch: ${emitted().filter(_._1 == 7L)}")
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

  /** Stream/batch parity, the q170 discipline: the transformWithState
    * gate fed the whole dataset in ONE batch must equal the q209 batch
    * twin exactly (admissions AND suppression counts); fed the same
    * data in-order across SEVERAL batches, the ADMISSION SEQUENCE
    * (key, first_ts) must still be identical — only cross-batch
    * suppression counts go silent (each emitted row counts same-batch
    * suppressions; a later batch's in-window arrival is dropped without
    * amending the already-emitted row), so the emitted total is a lower
    * bound of the batch twin's.
    */
  test("stream/batch parity with the q209 admission chain") {
    val ttlMs = 10 * 60_000L
    val arrivals = Seq(
      // key 1: admit t0 (suppress t1,t5), re-admit t12 (suppress t15)
      KeyedArrival(1, t(0)), KeyedArrival(1, t(1)), KeyedArrival(1, t(5)),
      KeyedArrival(1, t(12)), KeyedArrival(1, t(15)),
      // key 2: single arrival
      KeyedArrival(2, t(3)),
      // key 3: batch spanning two windows back-to-back
      KeyedArrival(3, t(0)), KeyedArrival(3, t(9)), KeyedArrival(3, t(10)),
      KeyedArrival(3, t(22)))

    def batchTwin(): Set[(Long, Timestamp, Long)] = {
      val df = spark.createDataset(arrivals).toDF()
        .select($"key", $"ts")
      graft.queries.LlmOps.ttlAdmissions(df, ttlMs * 1000L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    }

    def streamed(slices: Seq[Seq[KeyedArrival]], name: String)
        : Seq[(Long, Timestamp, Long)] = {
      val input = MemoryStream[KeyedArrival]
      val gate = TtlDedup.firstSeen(spark, input.toDS(),
        watermark = "0 seconds", ttlMs = ttlMs)
      val q = gate.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        slices.foreach { s => input.addData(s); q.processAllAvailable() }
        spark.table(name).as[FirstSeen].collect()
          .map(f => (f.key, f.first_ts, f.n_suppressed)).toSeq
      } finally q.stop()
    }

    val twin = batchTwin()
    assert(twin == Set(
      (1L, t(0), 2L), (1L, t(12), 1L), (2L, t(3), 0L),
      (3L, t(0), 1L), (3L, t(10), 0L), (3L, t(22), 0L)))

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // single batch: full equality, counts included
      assert(streamed(Seq(arrivals), "ttl_parity_one").toSet == twin)

      // in-order multi-batch slicing: identical admission sequence;
      // emitted suppression total is a lower bound (cross-batch
      // suppressions are silent by design)
      val sliced = streamed(
        arrivals.sortBy(_.ts.getTime).grouped(3).toSeq, "ttl_parity_many")
      assert(sliced.map(a => (a._1, a._2)).toSet ==
        twin.map(a => (a._1, a._2)),
        s"admission sequence diverged under re-batching: $sliced")
      assert(sliced.map(_._3).sum <= twin.toSeq.map(_._3).sum)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** The watermark-buffered gate: identical keyed arrivals delivered in
    * two different batch slicings — one with a LATE (out-of-order but
    * within-watermark) arrival in a later batch — must produce
    * IDENTICAL admissions, equal to the q209 batch twin (event-time-
    * minimum representative, complete suppression counts). The eager
    * gate on the same adversarial slicing picks the other
    * representative — the documented trade the buffered twin closes.
    */
  test("buffered gate: slicing-independent admissions for out-of-order keys") {
    val ttlMs = 10 * 60_000L
    // key 1 event-time order 3,5,8 → one window: admit t3, suppress 2
    // key 2: two windows
    val arrivals = Seq(
      KeyedArrival(1, t(5)), KeyedArrival(1, t(3)), KeyedArrival(1, t(8)),
      KeyedArrival(2, t(0)), KeyedArrival(2, t(20)))
    val twin = {
      val df = spark.createDataset(arrivals).toDF().select($"key", $"ts")
      graft.queries.LlmOps.ttlAdmissions(df, ttlMs * 1000L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    }
    assert(twin == Set((1L, t(3), 2L), (2L, t(0), 0L), (2L, t(20), 0L)))

    val flush = Seq(Seq(KeyedArrival(99, t(1000))), Seq(KeyedArrival(99, t(1001))),
      Seq(KeyedArrival(99, t(1002))))
    def streamed(buffered: Boolean, slices: Seq[Seq[KeyedArrival]],
        name: String): Set[(Long, Timestamp, Long)] = {
      val input = MemoryStream[KeyedArrival]
      val gate =
        if (buffered) TtlDedup.firstSeenBuffered(spark, input.toDS(),
          watermark = "30 minutes", ttlMs = ttlMs)
        else TtlDedup.firstSeen(spark, input.toDS(),
          watermark = "30 minutes", ttlMs = ttlMs)
      val q = gate.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        (slices ++ flush).foreach { s => input.addData(s); q.processAllAvailable() }
        spark.table(name).as[FirstSeen].collect()
          .filter(_.key < 99L)
          .map(f => (f.key, f.first_ts, f.n_suppressed)).toSet
      } finally q.stop()
    }

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // adversarial slicing: the late t(3) lands one batch AFTER t(5)
      val adversarial = Seq(
        Seq(KeyedArrival(1, t(5)), KeyedArrival(2, t(0))),
        Seq(KeyedArrival(1, t(3)), KeyedArrival(2, t(20))),
        Seq(KeyedArrival(1, t(8))))
      val one = streamed(buffered = true, Seq(arrivals), "ttlb_one")
      val adv = streamed(buffered = true, adversarial, "ttlb_adv")
      assert(one == twin, s"single-batch buffered must equal the twin: $one")
      assert(adv == twin, s"adversarial slicing must equal the twin: $adv")

      // the eager gate on the same adversarial slicing picks t(5) —
      // the divergence the buffered twin exists to remove
      val eager = streamed(buffered = false, adversarial, "ttle_adv")
      assert(eager.contains((1L, t(5), 0L)) && !eager.contains((1L, t(3), 2L)),
        s"eager gate unexpectedly slicing-independent here: $eager")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
