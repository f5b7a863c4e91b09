package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main — times every registered query end-to-end.
  *
  * Each query is executed with a `noop`-format write so the timed plan is
  * the SAME plan Verify materializes (a bare `.count()` lets Catalyst prune
  * sorts/projections and would time a cheaper plan). Failures are surfaced
  * on stderr and reported as -1, never silently recorded as a fast time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // pin the managed-table location (q59/q60 bucketed layouts) inside
      // the repo regardless of the invoking working directory
      .config("spark.sql.warehouse.dir", "/root/repo/spark-warehouse")
      // bench times q59's and q130's production (sketch-only) shapes;
      // the exact verification branches stay in Verify — see
      // q59Sketches / q130JoinCard
      .config("spark.graft.q59.verifyExact", "false")
      .config("spark.graft.q130.verifyExact", "false")
      // STATIC conf, must precede the first session: the generated-class
      // cache defaults to 100 entries, and the interleaved schedule
      // (261 queries per round, several codegen units each) evicts a
      // query's classes between its own samples — every sample then
      // re-runs Janino, a flat ~0.3-0.5 s tax misread as plan cost
      // (round-18: the first interleaved sf0.1 run came in at 292 s vs
      // 169 s precisely from this; block-iterated samples hid it by
      // hitting the 100-entry cache back-to-back)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // startup-time warehouse hygiene (see Layouts.sweepStale): before any
    // layout is built or reused, reclaim generations orphaned by a
    // fixture regeneration — bounded directory listing, one-time cost
    val swept = graft.sources.Layouts.sweepStale(spark, sfDir)
    if (swept.nonEmpty)
      System.err.println(s"[bench] swept ${swept.size} stale layout dir(s)")
    // Reuse analyzed table DataFrames across queries: the fixture dirs are
    // immutable for the whole run, so re-listing files and re-reading
    // footers per query is pure fixed overhead (round-4 verdict: ~0.3-0.5s
    // per-query floor across 58 queries dominates the proxy ratio).
    Tables.enableReuse()
    // Warm the session (JVM classloading, parquet footer cache) on the
    // smallest fixture so fixed startup cost isn't attributed to queries.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // MEASUREMENT DESIGN (round-18, replacing per-query AAA,BBB blocks):
    //   1. one WARMUP pass over every query in name order — absorbs
    //      first-touch Janino codegen + JIT per plan shape (round-2
    //      verdict) and one-time layout side work (q59/q60 CTAS), so
    //      neither lands in a timed sample;
    //   2. THREE timed ROUNDS, each executing every query once,
    //      ROUND-ROBIN (A,B,C,A,B,C): a query's samples are now spread
    //      ~minutes apart, so an ambient-contention window (the
    //      round-17 driver tail's 22% spread that every round
    //      re-litigates) inflates ONE round of many queries — visible
    //      as a correlated per-round stripe in the iterations artifact
    //      — instead of silently tripling one query's median;
    //   3. adaptive WIDENING, also interleaved: queries whose three
    //      samples still spread >2x get two extra rounds (contention is
    //      ambient, not plan cost — round-6 verdict: q59 15.2 s median
    //      vs 1.8 s isolated under exactly this signature), then their
    //      registered per-branch diagnostics run for attribution.
    // A single gc+quiesce separates consecutive samples (round-robin
    // already puts ~260 queries of natural separation between two
    // samples of the same plan; the round-4 double-GC discipline keeps
    // one query's heap debt off its neighbor). Failures are surfaced on
    // stderr and reported as -1, never silently recorded as fast.
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.LinkedHashMap(
      qseq.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    val dead = scala.collection.mutable.Set.empty[String]
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        tag: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // stderr breadcrumb per iteration (round-6 verdict task 2c): when
      // the environment inflates a sample, the full log shows exactly
      // which round of which query stalled.
      System.err.println(f"[bench] $name $tag dt=$dt%.3fs")
      dt
    }
    def quiesce(): Unit = { System.gc(); Thread.sleep(50) }
    qseq.foreach { case (n, fn) =>
      System.gc(); Thread.sleep(100)
      if (once(n, fn, "warmup") < 0) dead += n
    }
    for (round <- 1 to 3; (n, fn) <- qseq if !dead(n)) {
      quiesce()
      val dt = once(n, fn, s"round$round")
      if (dt < 0) dead += n else samples(n) = samples(n) :+ dt
    }
    val widen = qseq.filter { case (n, _) =>
      !dead(n) && samples(n).length == 3 &&
        samples(n).max > 2 * samples(n).min
    }
    for (round <- 4 to 5; (n, fn) <- widen if !dead(n)) {
      quiesce()
      val dt = once(n, fn, s"round$round")
      if (dt < 0) dead += n else samples(n) = samples(n) :+ dt
    }
    // Attribution breadcrumbs AFTER all timed samples (their own
    // allocation debt must not contaminate a later sample): each widened
    // query's registered per-branch diagnostic times its constituent
    // plans, so a recurring stall is attributable — scheduling delay
    // hits every branch; a plan regression names its branch.
    widen.foreach { case (n, _) =>
      SparkEntry.diagnostics.get(n).foreach { diag =>
        try diag(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $n diagnose failed: ${e.getMessage}")
        }
      }
    }
    // A query that failed at ANY point reports -1 (the file's contract:
    // failures are never silently recorded as fast, and a widening
    // failure does not fall back to the clean 3-sample median).
    val results = qseq.map { case (name, _) =>
      val iters = if (dead(name)) Vector.empty[Double] else samples(name)
      val median =
        if (iters.length < 3) -1.0
        else iters.sorted.apply(iters.length / 2)
      (name, median, iters)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val its = results.map { case (k, _, iters) =>
      "\"" + k + "\":[" + iters.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // min + median + spread (max/min) per query: the contention
    // diagnosis in ONE artifact line — a high-spread query under an
    // interleaved schedule is ambient load (its min is the plan cost);
    // a tight spread IS the plan cost (round-17 verdict item 5).
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val stats = results.map { case (k, med, iters) =>
      val s =
        if (iters.isEmpty)
          """{"min":-1,"median":-1,"spread":-1}"""
        else {
          val spread = if (iters.min > 0) r3(iters.max / iters.min) else -1.0
          s"""{"min":${r3(iters.min)},"median":${r3(med)},"spread":$spread}"""
        }
      "\"" + k + "\":" + s
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // total:-1 when anything failed — the headline metric must never look
    // better because a query was excluded (round-2 advice).
    val total =
      if (failed > 0) -1.0 else results.collect { case (_, v, _) if v >= 0 => v }.sum
    // BOUNDED aggregate-stats line + contention self-label (round-18
    // verdict item 6): the driver keeps only ~2 KB of output TAIL, into
    // which a 261-query stats map can never fit — but min-sum /
    // median-sum / spread histogram DO, and they are exactly what
    // separates "the code got slower" from "the window was contended"
    // (round-18: driver tail read 189.4 s while the clean run read
    // 156.2 s; 41 queries had spread >2x — ambient, but the artifact
    // couldn't say so by itself).
    val clean = results.filter(_._2 >= 0)
    val minSum = r3(clean.map(_._3.min).sum)
    val medianSum = r3(clean.map(_._2).sum)
    val spreads = clean.map { case (n, _, iters) =>
      (n, if (iters.min > 0) iters.max / iters.min else -1.0) }
    val nSpread2 = spreads.count(_._2 > 2.0)
    val worst = spreads.sortBy(-_._2).take(3)
      .map { case (n, sp) => "\"" + n + "\":" + r3(sp) }.mkString("{", ",", "}")
    val verdict =
      if (nSpread2 > 10) "CONTENDED" else if (nSpread2 > 3) "noisy" else "quiet"
    val statsSummary =
      s"""{"metric":"stats_summary","min_sum":$minSum,""" +
        s""""median_sum":$medianSum,"n_spread_gt2":$nSpread2,""" +
        s""""worst_spread":$worst,"window":"$verdict","failed":$failed,""" +
        s""""sf":"$sfDir"}"""
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"sf":"$sfDir"}"""
    // Line order matters: the capture harness keeps the output TAIL. The
    // unbounded per-query lines (stats map, medians, iteration arrays)
    // print FIRST — durable in the summary file, visible at the top of a
    // full log — and the LAST two stdout lines are SHORT AND BOUNDED
    // (aggregate stats + headline, ~300 bytes together regardless of
    // query count), so any tail capture keeps the numbers that matter.
    println(s"""{"metric":"stats","stats":$stats,"sf":"$sfDir"}""")
    println(s"""{"metric":"queries","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"iterations","iterations":$its,"sf":"$sfDir"}""")
    println(statsSummary)
    println(headline)
    // Belt-and-braces artifact (round-7 verdict task 1): the stdout capture
    // harness keeps only a bounded TAIL and its parser has eaten the final
    // line five rounds running (sbt's own `[success]` trailer prints after
    // ours and cannot be suppressed from here). Writing the same summary to
    // a file makes the headline independent of any stdout capture; stdout
    // stays authoritative for the driver, the file is the durable copy.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_SUMMARY.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
      try {
        w.println(s"""{"metric":"queries","queries":$qs,"sf":"$sfDir"}""")
        w.println(s"""{"metric":"iterations","iterations":$its,"sf":"$sfDir"}""")
        w.println(s"""{"metric":"stats","stats":$stats,"sf":"$sfDir"}""")
        w.println(statsSummary)
        w.println(headline)
      } finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] summary file write failed ($outPath): ${e.getMessage}")
    }
    spark.stop()
  }
}
