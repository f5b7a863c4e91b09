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
