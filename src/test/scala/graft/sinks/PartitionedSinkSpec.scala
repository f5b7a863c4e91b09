package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** S8 — the warehouse layout the reference configures in BigQuery
  * (DAY partitioning + clustering, load_to_bq.py:99-102), as a Spark
  * partitioned parquet write: `partitionBy` ≈ time partitioning,
  * `sortWithinPartitions` ≈ clustering (parquet min/max row-group stats).
  * Asserts the property that makes the layout matter at 100 TB: a
  * partition-key predicate prunes the scan to matching directories.
  */
class PartitionedSinkSpec extends SparkSpec {

  test("partitionBy write round-trips and prunes on the partition key") {
    val dir = Files.createTempDirectory("graft_sink_").toFile.getAbsolutePath
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("order_year", year(col("o_orderdate")))

    orders
      .sortWithinPartitions("o_custkey") // ≈ clustering: row-group stats enable skipping
      .write.mode("overwrite")
      .partitionBy("order_year")
      .parquet(dir)

    val back = spark.read.parquet(dir)
    // round-trip: no rows lost or duplicated
    assert(back.count() == orders.count())

    val pruned = back.filter(col("order_year") === 1995)
    val expected = orders.filter(col("order_year") === 1995).count()
    assert(pruned.count() == expected)

    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"),
      s"partition predicate must reach the scan as a PartitionFilter:\n$plan")
    // the pushed partition filter must not ALSO appear as a data filter —
    // pruning happens at file listing, before any row is read
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("1995"))
  }
}
