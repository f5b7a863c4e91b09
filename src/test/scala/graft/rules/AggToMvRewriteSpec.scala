package graft.rules

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MV query-rewrite rule: subsumed aggregates are answered from
  * the rollup MV with identical results, every refusal guard holds
  * (wrong table, non-dim grouping, non-decomposable aggregate,
  * non-dim filter), and original output ids survive under parents.
  */
class AggToMvRewriteSpec extends SparkSpec {
  import spark.implicits._

  // a little fact table written to a path carrying the registered tag
  private lazy val factPath = {
    val p = Files.createTempDirectory("mvspec_").toString + "/fact_mvspec"
    Seq(
      ("A", "x", 1L, 10L), ("A", "x", 2L, 20L), ("A", "y", 3L, 30L),
      ("B", "x", 4L, 40L), ("B", "y", 5L, 50L), ("B", "y", 6L, 60L))
      .toDF("flag", "status", "qty", "price")
      .write.parquet(p)
    p
  }
  private def fact = spark.read.parquet(factPath)

  private lazy val mvPath = {
    val p = Files.createTempDirectory("mvspec_mv_").toString + "/mv"
    fact.groupBy("flag", "status")
      .agg(sum("qty").as("mv_sum_qty"), count(lit(1)).as("mv_cnt"))
      .write.parquet(p)
    p
  }

  private def registered(): Unit =
    AggToMvRewrite.register(AggToMvRewrite.MvDef(
      factTag = "fact_mvspec", dims = Set("flag", "status"),
      sums = Map("qty" -> "mv_sum_qty"), cntCol = "mv_cnt",
      mvPath = mvPath))

  private def rewrite(df: DataFrame) =
    AggToMvRewrite.rewrite(spark, df.queryExecution.analyzed)

  private def run(df: DataFrame): Seq[Seq[Any]] = {
    val out = org.apache.spark.sql.GraftColumnBridge
      .ofRows(spark, rewrite(df))
    out.collect().map(_.toSeq.toList).toSeq
  }

  test("subsumed rollup is answered from the MV, identically") {
    registered()
    val q = fact.groupBy("flag")
      .agg(sum("qty").as("sq"), count(lit(1)).as("n"))
      .orderBy("flag")
    val p = rewrite(q)
    assert(AggToMvRewrite.scansPath(p, mvPath) &&
      !AggToMvRewrite.scansPath(p, "fact_mvspec"))
    assert(run(q) == Seq(Seq("A", 6L, 3L), Seq("B", 15L, 3L)))
    // dims-only filter transfers to the MV
    val qf = fact.filter(col("status") === "y").groupBy("flag")
      .agg(count(lit(1)).as("n")).orderBy("flag")
    assert(AggToMvRewrite.scansPath(rewrite(qf), mvPath))
    assert(run(qf) == Seq(Seq("A", 1L), Seq("B", 2L)))
    // exact-grain query works too (no rollup needed, still subsumed)
    val qg = fact.groupBy("flag", "status").agg(sum("qty").as("sq"))
      .orderBy("flag", "status")
    assert(AggToMvRewrite.scansPath(rewrite(qg), mvPath))
    assert(run(qg) == Seq(Seq("A", "x", 3L), Seq("A", "y", 3L),
      Seq("B", "x", 4L), Seq("B", "y", 11L)))
  }

  test("installed session-wide, the config-gated rule fires transparently") {
    registered()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ AggToMvRewrite.Installed
    spark.conf.set(AggToMvRewrite.ConfKey, "true")
    try {
      // query executions cache their optimized plan, so build afresh
      // for each gate setting
      def q = fact.groupBy("flag")
        .agg(sum("qty").as("sq"), count(lit(1)).as("n")).orderBy("flag")
      // no explicit rewrite() call — the optimizer applies it
      val on = q
      assert(AggToMvRewrite.scansPath(on.queryExecution.optimizedPlan, mvPath))
      assert(on.collect().map(_.toSeq.toList).toSeq ==
        Seq(Seq("A", 6L, 3L), Seq("B", 15L, 3L)))
      // gate off → untouched
      spark.conf.set(AggToMvRewrite.ConfKey, "false")
      assert(!AggToMvRewrite.scansPath(q.queryExecution.optimizedPlan, mvPath))
    } finally {
      spark.conf.unset(AggToMvRewrite.ConfKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("every refusal guard leaves the plan untouched") {
    registered()
    def untouched(df: DataFrame): Unit = {
      val p = rewrite(df)
      assert(!AggToMvRewrite.scansPath(p, mvPath), p.treeString)
      assert(AggToMvRewrite.scansPath(p, "fact_mvspec"))
    }
    // grouping by a non-dimension
    untouched(fact.groupBy("qty").agg(count(lit(1)).as("n")))
    // a measure the MV does not carry
    untouched(fact.groupBy("flag").agg(sum("price").as("sp")))
    // a non-decomposable aggregate
    untouched(fact.groupBy("flag").agg(countDistinct("qty").as("d")))
    // avg is not offered (caller expresses it as sum/cnt)
    untouched(fact.groupBy("flag").agg(avg("qty").as("a")))
    // a filter on a non-dimension column
    untouched(fact.filter(col("qty") > 1).groupBy("flag")
      .agg(count(lit(1)).as("n")))
    // count(NULL) is 0 per group, NOT the group row count — the
    // mv.cnt rewrite would be a wrong answer, so the guard refuses
    untouched(fact.groupBy("flag")
      .agg(count(lit(null).cast("int")).as("n")))
    // an unregistered table of identical shape
    val other = fact.limit(6)
    val p = rewrite(other.groupBy("flag").agg(count(lit(1)).as("n")))
    assert(!AggToMvRewrite.scansPath(p, mvPath))
    // cast-shape mismatch: this MV's partial is the raw sum(qty), so a
    // per-row-truncating sum(cast(qty AS BIGINT)) must refuse — on a
    // fractional measure the two are different numbers
    untouched(fact.groupBy("flag").agg(sum(col("qty").cast("long")).as("sq")))
    untouched(fact.groupBy("flag").agg(sum(col("qty").cast("int")).as("sq")))
  }

  test("a truncating MV partial never answers an uncast sum (and the " +
      "declared cast shape must match exactly)") {
    // fractional fact: per-row truncation (1.6+1.6 → 1+1=2) differs
    // from the raw sum (3.2) — the exact failure ADVICE r17 flagged
    val fp = Files.createTempDirectory("mvspec_frac_").toString + "/fact_mvfrac"
    Seq(("A", 1.6), ("A", 1.6), ("B", 2.9))
      .toDF("flag", "value").write.parquet(fp)
    val frac = spark.read.parquet(fp)
    val fmv = Files.createTempDirectory("mvspec_fracmv_").toString + "/mv"
    frac.groupBy("flag")
      .agg(sum(col("value").cast("long")).as("mv_sum_v"),
        count(lit(1)).as("mv_cnt"))
      .write.parquet(fmv)
    AggToMvRewrite.register(AggToMvRewrite.MvDef(
      factTag = "fact_mvfrac", dims = Set("flag"),
      sums = Map("value" -> "mv_sum_v"), cntCol = "mv_cnt", mvPath = fmv,
      sumCast = Map("value" -> org.apache.spark.sql.types.LongType)))
    // identical cast shape → rewritten, and exact
    val qCast = frac.groupBy("flag")
      .agg(sum(col("value").cast("long")).as("sv")).orderBy("flag")
    assert(AggToMvRewrite.scansPath(rewrite(qCast), fmv))
    assert(run(qCast) == Seq(Seq("A", 2L), Seq("B", 2L)))
    // uncast sum over the fractional measure → REFUSED (the truncated
    // partial would answer 2.0 where the fact says 3.2)
    val qRaw = frac.groupBy("flag")
      .agg(sum(col("value")).as("sv")).orderBy("flag")
    val pRaw = rewrite(qRaw)
    assert(!AggToMvRewrite.scansPath(pRaw, fmv))
    assert(run(qRaw).map(_.last) == Seq(1.6 + 1.6, 2.9))
    // a DIFFERENT cast type also refuses
    assert(!AggToMvRewrite.scansPath(rewrite(frac.groupBy("flag")
      .agg(sum(col("value").cast("int")).as("sv"))), fmv))
  }

  test("DSv2 fact matching is exact: changelog / history / as-of reads " +
      "of the registered kv path never rewrite") {
    val kv = Files.createTempDirectory("mvspec_kv_").toString + "/t"
    val rows = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L))
      .toDF("id", "name", "value")
    rows.write.format("graft-kv").option("path", kv)
      .option("buckets", 2).mode("overwrite").save()
    // second commit so an as-of snapshot differs from current
    Seq((4L, "B", 40L)).toDF("id", "name", "value")
      .write.format("graft-kv").option("path", kv).mode("append").save()
    val kmv = Files.createTempDirectory("mvspec_kvmv_").toString + "/mv"
    spark.read.format("graft-kv").option("path", kv).load()
      .groupBy("name")
      .agg(sum("value").as("mv_sum_v"), count(lit(1)).as("mv_cnt"))
      .write.parquet(kmv)
    AggToMvRewrite.register(AggToMvRewrite.MvDef(
      factTag = kv, dims = Set("name"),
      sums = Map("value" -> "mv_sum_v"), cntCol = "mv_cnt", mvPath = kmv))
    def agg(df: DataFrame) =
      df.groupBy("name").agg(sum("value").as("sv")).orderBy("name")
    // current-snapshot read: rewritten, exact
    val cur = agg(spark.read.format("graft-kv").option("path", kv).load())
    assert(AggToMvRewrite.scansPath(rewrite(cur), kmv))
    assert(run(cur) == Seq(Seq("A", 30L), Seq("B", 70L)))
    // changelog / as-of / history reads of the SAME path: refused —
    // answering them from the full-table MV would be wrong rows
    val clog = spark.read.format("graft-kv").option("path", kv)
      .option("changelog", "true").load()
    assert(!AggToMvRewrite.scansPath(
      rewrite(agg(clog.select("name", "value"))), kmv))
    val asOf = spark.read.format("graft-kv").option("path", kv)
      .option("asOfSeq", "0").load()
    assert(!AggToMvRewrite.scansPath(rewrite(agg(asOf)), kmv))
    assert(run(agg(asOf)) == Seq(Seq("A", 30L), Seq("B", 30L)))
  }
}
