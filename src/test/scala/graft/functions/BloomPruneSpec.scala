package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("no false negatives: every true member passes the probe") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bloom = BloomPrune.buildBloom(urgent, col("o_orderkey"), urgent.count(), 0.01)
    val missed = urgent
      .filter(!BloomPrune.mightContain(bloom, col("o_orderkey")))
      .count()
    assert(missed == 0L, s"$missed inserted keys rejected by their own bloom")
  }

  test("false-positive rate stays near the sizing fpp") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bloom = BloomPrune.buildBloom(urgent, col("o_orderkey"), urgent.count(), 0.01)
    // orderkeys are sparse in [1, 8*count): probe definite non-members
    val nonMembers = Tables.orders(spark, d)
      .filter(col("o_orderpriority") =!= "1-URGENT").select(col("o_orderkey"))
    val n = nonMembers.count()
    val fp = nonMembers
      .filter(BloomPrune.mightContain(bloom, col("o_orderkey")))
      .count()
    assert(fp <= 5 * 0.01 * n + 64,
      s"$fp false positives over $n non-members exceeds 5x fpp")
  }

  test("probe is an expression, not a join, and stays in whole-stage codegen") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bloom = BloomPrune.buildBloom(urgent, col("o_orderkey"), urgent.count(), 0.01)
    val pruned = Tables.lineitem(spark, d)
      .filter(BloomPrune.mightContain(bloom, col("l_orderkey")))
      .select("l_orderkey")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"bloom pruning must not plan a join:\n$plan")
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined,
      s"bloom probe must stay inside codegen:\n$plan")
    // and the pruned count lies between exact-match count and full count
    val exact = Tables.lineitem(spark, d)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val got = pruned.count()
    val total = Tables.lineitem(spark, d).count()
    assert(got >= exact && got < total, s"pruned=$got exact=$exact total=$total")
  }

  test("single-action build returns the exact key count with the sketch") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val expected = urgent.count()
    val (bloom, n) =
      BloomPrune.buildBloomWithCount(urgent, col("o_orderkey"), 1L << 17, 0.01)
    assert(n == expected, s"folded count $n != $expected")
    val missed = urgent
      .filter(!BloomPrune.mightContain(bloom, col("o_orderkey"))).count()
    assert(missed == 0L)
  }

  test("an undershooting capacity hint rebuilds at exact size, keeping no-FN") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val expected = urgent.count()
    assert(expected > 1L)
    // hint of 1 forces the overflow-rebuild path
    val (bloom, n) =
      BloomPrune.buildBloomWithCount(urgent, col("o_orderkey"), 1L, 0.01)
    assert(n == expected)
    val missed = urgent
      .filter(!BloomPrune.mightContain(bloom, col("o_orderkey"))).count()
    assert(missed == 0L, s"$missed keys rejected after the exact-size rebuild")
  }

  test("duplicate-keyed input sizes by distinct keys, not rows") {
    // fpp is governed by distinct insertions; a rows >> distinct input
    // must neither rebuild nor hit the clamp at row-count scale. 5M rows
    // over 1000 distinct keys with a 2000 hint: the old row-count check
    // would rebuild at 5M and throw on the 4M clamp.
    import spark.implicits._
    val keys = spark.range(5000000L).select((col("id") % 1000L).as("k"))
    val (bloom, n) = BloomPrune.buildBloomWithCount(keys, col("k"), 2000L, 0.01)
    assert(n == 5000000L, "returned count is the ROW count")
    val missed = spark.range(1000L).select(col("id").as("k"))
      .filter(!BloomPrune.mightContain(bloom, col("k"))).count()
    assert(missed == 0L)
  }

  test("a request beyond the session clamp fails loudly instead of degrading") {
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val e = intercept[IllegalArgumentException] {
      BloomPrune.buildBloom(urgent, col("o_orderkey"), maxItems + 1, 0.01)
    }
    assert(e.getMessage.contains("clamp"), e.getMessage)
  }

  test("an empty key set rejects everything, like a semi-join with an empty dim") {
    val empty = Tables.orders(spark, d)
      .filter(col("o_orderkey") < 0).select(col("o_orderkey"))
    val bloom = BloomPrune.buildBloom(empty, col("o_orderkey"), 0L, 0.01)
    val passed = Tables.lineitem(spark, d)
      .filter(BloomPrune.mightContain(bloom, col("l_orderkey"))).count()
    assert(passed == 0L)
  }
}
