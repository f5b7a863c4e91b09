package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupPurgeSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q72 purge agrees with q63 clusters: one survivor per cluster, rest removed") {
    val clusters = LlmOps.q63DedupClusters(spark, d)
      .as[(Long, Long, Long)].collect()
    val expectedRemoved = clusters.count { case (doc, cid, _) => doc != cid }
    val audit = LlmOps.q72DedupPurge(spark, d)
      .as[(String, Long, Long, Long)].collect()
    val total = Tables.documents(spark, d).count()
    assert(audit.map(_._2).sum == total, "audit must cover every document")
    audit.foreach { case (src, n, kept, removed) =>
      assert(kept + removed == n, s"$src: kept+removed must partition the source")
    }
    assert(audit.map(_._4).sum == expectedRemoved,
      "total removals must equal the non-canonical cluster members")
    // every cluster keeps exactly one member: removals = members - clusters
    val nClusters = clusters.map(_._2).distinct.length
    assert(expectedRemoved == clusters.length - nClusters)
  }
}
