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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM classloading, parquet footer cache) on the
    // smallest fixture so fixed startup cost isn't attributed to queries.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // Two iterations per query; iteration 1 absorbs first-touch Janino
    // codegen + JIT for that plan shape, iteration 2 is the reported
    // steady-state (round-2 verdict: one-time compile was mis-attributed
    // to whichever query first hit a new plan shape).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      name -> (if (warm < 0) -1.0 else once())
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // total:-1 when anything failed — the headline metric must never look
    // better because a query was excluded (round-2 advice).
    val total =
      if (failed > 0) -1.0 else results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
