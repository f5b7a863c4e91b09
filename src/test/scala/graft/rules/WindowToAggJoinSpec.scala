package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The whole-partition-window → pre-aggregated-join rewrite: fires only
  * on the safe shape, preserves values bit-for-bit (NULL keys
  * included), and leaves ordered/ranking windows untouched.
  */
class WindowToAggJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the rule installed and enabled on the shared
    * session, restoring both afterwards. */
  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ WindowToAggJoin
    spark.conf.set(WindowToAggJoin.ConfKey, "true")
    try body
    finally {
      spark.conf.unset(WindowToAggJoin.ConfKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  private def fixture = Seq(
    (1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, Some("b"), 30L),
    (4L, None, 40L), (5L, None, 50L), (6L, Some("b"), 60L), (7L, Some("c"), 70L)
  ).toDF("id", "k", "x")

  private def counts(df: DataFrame) = df
    .withColumn("c", count(lit(1)).over(Window.partitionBy("k")))
    .withColumn("s", sum(col("x")).over(Window.partitionBy("k")))

  test("rewrites to one aggregate + join, no Window, values identical") {
    val expected = counts(fixture).orderBy("id").collect().toSeq
    withRule {
      val df = counts(fixture)
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: LWindow => w }.isEmpty, s"Window survived:\n$plan")
      assert(plan.collect { case a: Aggregate => a }.size == 1,
        "both aggs must share ONE pre-aggregate")
      assert(plan.collect { case j: Join => j }.nonEmpty)
      assert(df.orderBy("id").collect().toSeq == expected,
        "rewrite must be value-identical")
    }
  }

  test("min/max whole-partition windows rewrite with identical values (q237's stage-1 shape)") {
    // the exact-dedup keep flag: doc_id == min(doc_id) OVER (PARTITION BY h)
    def flag(df: DataFrame) = df
      .withColumn("keep", col("id") === min(col("id")).over(Window.partitionBy("k")))
      .withColumn("hi", max(col("x")).over(Window.partitionBy("k")))
    val expected = flag(fixture).orderBy("id").collect().toSeq
    withRule {
      val df = flag(fixture)
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: LWindow => w }.isEmpty,
        s"min/max window survived:\n$plan")
      assert(plan.collect { case j: Join => j }.nonEmpty)
      assert(df.orderBy("id").collect().toSeq == expected,
        "min/max rewrite must be value-identical (NULL key group included)")
    }
  }

  test("NULL keys form one group, exactly like the window") {
    withRule {
      val got = counts(fixture).filter(col("k").isNull)
        .select("id", "c", "s").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((4L, 2L, 90L), (5L, 2L, 90L)),
        "null-safe join must keep the NULL-key group")
    }
  }

  test("ordered and ranking windows pass through untouched") {
    withRule {
      val df = fixture.withColumn("r",
        row_number().over(Window.partitionBy("k").orderBy("id")))
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: LWindow => w }.nonEmpty,
        "ranking window must NOT be rewritten")
      // and a mixed query rewrites only the whole-partition aggregate
      val mixed = counts(fixture).withColumn("r",
        row_number().over(Window.partitionBy("k").orderBy("id")))
      val mp = mixed.queryExecution.optimizedPlan
      assert(mp.collect { case w: LWindow => w }.size == 1,
        "exactly the ranking window survives")
      assert(mp.collect { case a: Aggregate => a }.size == 1)
      val got = mixed.orderBy("id").select("id", "c", "r").collect()
      assert(got.length == 7 && got.head.getLong(1) == 2L)
    }
  }

  test("bounded frames are not rewritten") {
    withRule {
      val df = fixture.withColumn("m", sum(col("x")).over(
        Window.partitionBy("k").orderBy("id").rowsBetween(-1, 0)))
      assert(df.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.nonEmpty)
    }
  }

  test("non-deterministic / unstable child subtrees are not rewritten") {
    // children built on Range, NOT a local relation: the optimizer
    // folds Project/Sample/Limit over LocalRelation into materialized
    // rows before extraOptimizations run, at which point duplication IS
    // safe — the guard matters for real (scan-backed) children
    def base = spark.range(100)
      .select(col("id"), (col("id") % 3).cast("string").as("k"),
        (col("id") * 10).as("x"))
    withRule {
      // rand() in the child: the two join legs would see different rows
      val r = base.withColumn("noise", rand(7)).filter(col("noise") >= 0)
      val randPlan = counts(r).queryExecution.optimizedPlan
      assert(randPlan.collect { case w: LWindow => w }.nonEmpty,
        "rand() child must NOT be rewritten")
      // unordered limit: each leg could pick a different row subset
      val limPlan = counts(base.limit(5)).queryExecution.optimizedPlan
      assert(limPlan.collect { case w: LWindow => w }.nonEmpty,
        "limit child must NOT be rewritten")
      // sample: same replay-instability
      val samPlan = counts(base.sample(0.5, seed = 7))
        .queryExecution.optimizedPlan
      assert(samPlan.collect { case w: LWindow => w }.nonEmpty,
        "sample child must NOT be rewritten")
      // and the same shape WITHOUT the unstable operator still rewrites
      val okPlan = counts(base).queryExecution.optimizedPlan
      assert(okPlan.collect { case w: LWindow => w }.isEmpty,
        "stable Range child must still be rewritten")
    }
  }

  test("rule is inert when the config gate is off") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ WindowToAggJoin
    try {
      val plan = counts(fixture).queryExecution.optimizedPlan
      assert(plan.collect { case w: LWindow => w }.nonEmpty,
        "gate off ⇒ no rewrite")
    } finally spark.experimental.extraOptimizations = prev
  }

  /** Run `body` with the rule installed in AUTO mode (stats-gated),
    * with optional threshold overrides. */
  private def withAuto[A](confs: (String, String)*)(body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ WindowToAggJoin
    spark.conf.set(WindowToAggJoin.ConfKey, "auto")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally {
      spark.conf.unset(WindowToAggJoin.ConfKey)
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      spark.experimental.extraOptimizations = prev
    }
  }

  test("auto mode: a type-bounded key space fires without statistics; " +
    "an unknowable key leaves the window alone") {
    withAuto() {
      // boolean partition key: ≤ 3 groups provable from the TYPE alone
      val byBool = fixture.withColumn("b", ($"id" % 2 === 0))
        .withColumn("c", count(lit(1)).over(Window.partitionBy("b")))
      assert(byBool.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.isEmpty,
        "boolean key must self-enable")
      // long key, no stats: cardinality invisible → refusal over
      // regression, the window survives
      val byId = fixture
        .withColumn("c", count(lit(1)).over(Window.partitionBy("id")))
      assert(byId.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }.nonEmpty,
        "an unknowable key must NOT rewrite in auto mode")
    }
  }

  test("auto mode: CBO column statistics gate the rewrite both ways — " +
    "few groups fires, near-unique stays") {
    val table = "wtaj_auto_stats"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    fixture.write.saveAsTable(table)
    try {
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS k, id")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // thresholds chosen so the STATIC path cannot fire (maxStatic=2)
      // and only the stats ratio decides: k has 4 distinct of 7 rows →
      // fires at ratio 0.9 (4 ≤ ⌊0.9·7⌋); id has 7 of 7 → stays
      withAuto(WindowToAggJoin.StaticKey -> "2",
        WindowToAggJoin.RatioKey -> "0.9") {
        val overK = spark.table(table)
          .withColumn("c", count(lit(1)).over(Window.partitionBy("k")))
        assert(overK.queryExecution.optimizedPlan
          .collect { case w: LWindow => w }.isEmpty,
          "distinctCount(k) ≪ rowCount must self-enable via CBO stats")
        val overId = spark.table(table)
          .withColumn("c", count(lit(1)).over(Window.partitionBy("id")))
        assert(overId.queryExecution.optimizedPlan
          .collect { case w: LWindow => w }.nonEmpty,
          "a near-unique analyzed key must NOT rewrite")
      }
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
