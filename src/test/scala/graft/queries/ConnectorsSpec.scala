package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

/** The two driver-gate queries that certify infrastructure rather than
  * table semantics: q196 (the graft-rest V2 scan itself) and q197 (the
  * window→agg-join rule end-to-end). The gate proves values; these pin
  * that the certified PLANS really carry the machinery under test.
  */
class ConnectorsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q196 plans the graft-rest V2 scan with pruned columns") {
    val df = Connectors.q196RestCatalog(spark, sf)
    // sparkPlan, not executedPlan: the aggregate's exchange puts the
    // executed plan behind an AdaptiveSparkPlanExec root
    val scans = df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "q196 must read through the V2 scan")
    assert(scans.head.scan.description().contains("graft-rest"))
    val read = scans.head.scan.readSchema().fieldNames.toSet
    assert(read == Set("page", "id", "value"),
      s"name must be pruned from the scan, got $read")
    // 5 pages at pagesPerPartition=2 -> 3 input partitions (fan-out,
    // not the single-partition degenerate)
    assert(scans.head.inputRDD.getNumPartitions == 3)
  }

  test("q196 values: page attribution, nulls, missing fields, short tail") {
    val rows = Connectors.q196RestCatalog(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0L) == ((4L, 4L, 6L, 1.5)))
    // page 1: one explicit null value
    assert(rows(1L) == ((4L, 3L, 22L, 4.0)))
    // page 3: one MISSING value field
    assert(rows(3L) == ((4L, 3L, 54L, 10.25)))
    // short last page
    assert(rows(4L) == ((2L, 2L, 33L, 8.25)))
  }

  test("q203's certified plan prunes pages and pushes the envelope count") {
    val df = Connectors.q203RestPushdown(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.length == 2, "one pruned row scan + one envelope-count scan")
    val descs = scans.map(_.scan.description())
    assert(descs.forall(_.contains("pushedPages=[1..3]")),
      s"both scans must carry the pruned page range: $descs")
    assert(descs.exists(_.contains("pushedAggregate=CountByPage")),
      s"the envelope-count branch must push the aggregate: $descs")
    // pages 1-3 at pagesPerPartition=2 -> 2 partitions on the row scan;
    // the aggregate scan is the single driver-computed partition
    assert(scans.map(_.inputRDD.getNumPartitions).sorted.toSeq == Seq(1, 2))
    // fully-claimed page predicates: no Spark-side Filter survives
    assert(df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, "page predicates must not leave a residual Filter")
  }

  test("q197's registered plan carries the rewrite: no Window, a pre-agg join") {
    val df = Relational.q197WindowRewrite(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      s"q197 must not plan a Window:\n$plan")
    assert(plan.collect { case j: Join => j }.nonEmpty,
      "q197 must carry the pre-aggregate join")
  }

  test("q197 values match the plain window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val want = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("qty_total",
        sum(col("qty")).over(Window.partitionBy("l_orderkey")))
      .orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber", "qty_total")
      .collect().toSeq
    val got = Relational.q197WindowRewrite(spark, sf)
      .select("l_orderkey", "l_linenumber", "qty_total")
      .collect().toSeq
    assert(got == want)
  }

  test("the rest revision ledger records MERGE publishes and survives replaces") {
    Connectors.q213SqlMerge(spark, sf).collect() // seed overwrite + MERGE
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath
    val hist = spark.read.format("graft-rest")
      .option("pages", s"$wh/graft_rest_merge/state")
      .option("history", true).load()
      .select("rev", "total").orderBy("rev").collect()
    assert(hist.length >= 2,
      s"ledger must carry the seed publish AND the MERGE's replace: ${hist.toSeq}")
    // revisions are dense from 0 and the LAST total matches the table
    assert(hist.map(_.getLong(0)).toSeq == hist.indices.map(_.toLong))
    val now = spark.table("graft_mrg.state").count()
    assert(hist.last.getLong(1) == now,
      "the latest revision's total must equal the current collection")
  }
}
