package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q83 invariants: the audit's totals reconcile exactly with q63's
  * clusters and q53's split rule, and span counts are consistent.
  */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("audit reconciles with an independent recomputation from q63 clusters") {
    val clusters = LlmOps.q63DedupClusters(spark, d)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val splitOf = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.ops.Splits.assign(col("doc_id"), Corpus.SplitCuts).as("split"))
      .as[(Long, String)].collect().toMap
    val want = clusters.groupBy(_._2).values
      .map(ms => (ms.map(m => splitOf(m._1)).distinct.length.toLong, ms.length.toLong))
      .groupBy(_._1)
      .map { case (n, cs) => (n, cs.size.toLong, cs.map(_._2).sum) }
      .toSet
    val got = LlmOps.q83SplitLeakage(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"got $got, want $want")
    // every clustered doc is audited exactly once
    assert(got.map(_._3).sum == clusters.length.toLong)
    // span counts bounded by the number of splits
    got.foreach { case (n, _, _) => assert(n >= 1L && n <= 3L) }
  }
}
