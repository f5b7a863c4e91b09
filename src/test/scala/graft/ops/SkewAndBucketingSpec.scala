package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The two scale levers the fact-to-fact join story depends on:
  * bucketed layouts (co-located joins, no exchange) and salting (hot-key
  * spreading with exact multiplicity preservation).
  */
class SkewAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables make the lineitem-orders join exchange-free") {
    val d = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed.orders_b")
    Tables.lineitem(spark, d)
      .write.format("parquet").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bucketed.lineitem_b")
    Tables.orders(spark, d)
      .write.format("parquet").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bucketed.orders_b")

    val joined = spark.table("graft_bucketed.lineitem_b")
      .join(spark.table("graft_bucketed.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString()
    // co-located bucketed sides: the join itself needs no shuffle — the
    // only Exchange left is the final tiny aggregation exchange
    val joinSection = plan.substring(plan.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not re-shuffle its inputs:\n$plan")

    // and it computes the same answer as the shuffling plan over raw files
    val expected = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(joined.orderBy("o_orderpriority").collect().toSeq == expected)

    spark.sql("DROP TABLE graft_bucketed.lineitem_b")
    spark.sql("DROP TABLE graft_bucketed.orders_b")
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    // The third skew lever (SURVEY scale posture): no manual salting —
    // AQE detects the oversized shuffle partition from runtime stats and
    // splits it across tasks. Thresholds are lowered so the toy fixture
    // trips the same code path a 100 TB hot key would.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one hot key carrying 200k rows vs 1000 cold keys of 20 rows
      val large = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(20000).select((col("id") % 1000 + 1).as("k"), col("id").as("v")))
      val small = spark.range(1001).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = large.join(small, "k")

      // collect() executes THIS DataFrame's QueryExecution (count() would
      // plan a separate aggregate), so the adaptive plan finalizes in
      // place and can be inspected afterwards
      assert(joined.collect().length == 220000, "skew split must not change the result")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan must have executed:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join after execution:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join preserves exact multiplicity while spreading a hot key") {
    // hot key: 100k rows of key=1, a few of others; small dim of 3 keys
    val large = (Seq.fill(100000)(1) ++ Seq(2, 2, 3)).toDF("k")
    val small = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val salted = Skew.saltedJoin(large, small, Seq("k"), salts = 8)
    // row-for-row identical to the plain join
    val plain = large.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().toSeq)
    // and the hot key is actually spread: >1 distinct salt observed
    val spread = Skew.saltLarge(large, 8).filter(col("k") === 1)
      .select("__salt").distinct().count()
    assert(spread > 4, s"hot key landed in only $spread salt partitions")
  }
}
