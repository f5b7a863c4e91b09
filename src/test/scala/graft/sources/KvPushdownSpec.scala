package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucket pruning on the kv scan: id-equality filters hash to their
  * buckets and the scan plans ONLY those; the pruning is coarse so the
  * filter is still evaluated post-scan (correctness never rides the
  * prune); non-equality predicates plan every bucket.
  */
class KvPushdownSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_pd"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("kv_pd_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  private def partitionsOf(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  test("a point lookup plans exactly one bucket; IN-list plans its buckets") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.p1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    (1L to 20L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "value")
      .write.format("graft-kv")
      .option("path", s"$root/p1").option("buckets", 4)
      .mode("overwrite").save()

    val point = spark.table(s"$Cat.p1").filter(col("id") === 7L)
    assert(point.collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(partitionsOf(point) == 1,
      s"point lookup must plan one bucket: ${point.queryExecution.executedPlan}")

    // ids 3 and 7 share bucket 3 (mod 4); 6 adds bucket 2 → 2 buckets
    val inList = spark.table(s"$Cat.p1")
      .filter(col("id").isin(3L, 6L, 7L))
    assert(inList.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 6L, 7L))
    assert(partitionsOf(inList) == 2,
      s"IN-list must plan its buckets only: ${inList.queryExecution.executedPlan}")

    // coarse pruning: bucket 3 also holds 11, 15, 19 — the post-scan
    // filter must still drop them (asserted by the exact result above);
    // a range predicate cannot prune and plans every bucket
    val range = spark.table(s"$Cat.p1").filter(col("id") > 15L)
    assert(range.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(16L, 17L, 18L, 19L, 20L))
    assert(partitionsOf(range) == 4, "non-equality predicates must not prune")

    // contradictory equalities intersect to the empty set → zero buckets
    val none = spark.table(s"$Cat.p1")
      .filter(col("id") === 7L && col("id") === 8L)
    assert(none.collect().isEmpty)
  }

  test("the bucket count is table metadata: a conflicting reader option fails loudly, never mis-prunes") {
    val r = root
    (1L to 20L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "value")
      .write.format("graft-kv")
      .option("path", s"$r/pb1").option("buckets", 4)
      .mode("overwrite").save()
    // the first commit persisted the count — a reader passing a
    // DIFFERENT count would hash id=7 to another bucket and silently
    // return zero rows; it must error instead
    val e = intercept[Exception] {
      spark.read.format("graft-kv")
        .option("path", s"$r/pb1").option("buckets", 8)
        .load().filter(col("id") === 7L).collect()
    }
    assert(e.getMessage.contains("bucketed 4-way"), e.getMessage)
    // a reader with NO option resolves the persisted count and prunes
    // correctly — the option was never load-bearing, the metadata is
    val noOpt = spark.read.format("graft-kv")
      .option("path", s"$r/pb1").load().filter(col("id") === 7L)
    assert(noOpt.collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(partitionsOf(noOpt) == 1,
      "optionless reader must prune via the persisted metadata")
    // a mismatched WRITER dies before scattering keys
    val we = intercept[Exception] {
      Seq((21L, "x", 1.0)).toDF("id", "name", "value")
        .write.format("graft-kv")
        .option("path", s"$r/pb1").option("buckets", 16)
        .mode("append").save()
    }
    assert(we.getMessage.contains("bucketed 4-way"), we.getMessage)
  }
}
