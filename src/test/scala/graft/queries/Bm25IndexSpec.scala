package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec

/** q206's maintained-postings contract: the probe reads only the term
  * shards of its workload (static partition pruning over the bucket
  * partitioning), results are complete/ordered, and re-runs reuse the
  * published layouts bit-identically.
  */
class Bm25IndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("the probe scan prunes to the workload's term shards") {
    val df = Corpus.q206Bm25Index(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("bm25post")) => f
    }
    assert(scans.nonEmpty, "the probe must read the published postings layout")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("bucket")),
      s"bucket shard filter missing: ${scan.partitionFilters}")
    // 7 distinct workload terms hash into at most 7 of 64 shards
    val nShards = scan.selectedPartitions.partitionCount
    assert(nShards <= 7, s"probe read $nShards shards, expected <= 7")
  }

  test("every query ranks TopK docs with descending scores") {
    val rows = Corpus.q206Bm25Index(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse,
        s"query $q scores not descending")
    }
  }

  test("a second run reuses the published layouts and is bit-identical") {
    val a = Corpus.q206Bm25Index(spark, sf).collect().toSeq
    val b = Corpus.q206Bm25Index(spark, sf).collect().toSeq
    assert(a == b)
  }
}
