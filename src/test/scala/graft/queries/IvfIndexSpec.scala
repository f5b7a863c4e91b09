package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec

/** q205's maintained-index contract: the probe reads the published
  * cell-partitioned layout under DYNAMIC PARTITION PRUNING (the plan
  * derives a file filter from the probed-cell join), results are
  * complete/ordered/deterministic, and a re-run reuses the published
  * layout instead of rebuilding.
  */
class IvfIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("the probe scan carries a dynamic partition pruning filter") {
    val df = LlmOps.q205IvfIndex(spark, sf)
    // sparkPlan, not executedPlan: AQE wraps the executed plan
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("ivfidx_lists")) => f
    }
    assert(scans.nonEmpty, "the probe must read the published lists layout")
    assert(scans.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))),
      s"lists scan should be DPP-pruned: ${scans.map(_.partitionFilters)}")
  }

  test("every query returns exactly TopK descending neighbors, excluding itself") {
    val rows = LlmOps.q205IvfIndex(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 500L by 50L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} rows")
      assert(!rs.exists(_.getLong(1) == q), "self must be excluded")
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, s"query $q sims not descending")
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("a second run reuses the published layouts and is bit-identical") {
    val a = LlmOps.q205IvfIndex(spark, sf).collect().toSeq
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    // scope to THIS fixture's content tag: other suites (PlanGuardSpec
    // walks every registered plan) legitimately build sf0.001 layouts
    val tag = graft.sources.Layouts.srcTag(spark, sf, "embeddings")
    val layouts = Option(new java.io.File(s"$wh/graft_layouts").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName).filter(_.endsWith(tag))
    assert(layouts.count(_.startsWith("ivfidx_lists_")) == 1, layouts.toSeq)
    assert(layouts.count(_.startsWith("ivfidx_cents_")) == 1, layouts.toSeq)
    val b = LlmOps.q205IvfIndex(spark, sf).collect().toSeq
    assert(a == b)
  }
}
