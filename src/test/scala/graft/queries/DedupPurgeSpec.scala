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

  test("q72's purge join is size-guarded: small removal set broadcasts under AQE") {
    val df = LlmOps.q72DedupPurge(spark, d)
    df.collect() // AQE finalizes the physical plan only after execution
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"a tiny removal set should convert to a runtime broadcast:\n$plan")
  }

  test("q72's purge join does NOT force a broadcast when the removal set is large") {
    // Simulate a removal set too large to broadcast (the 30-50% dup-rate
    // web-crawl case) by disabling both broadcast thresholds: a FORCED
    // broadcast hint would ignore them and OOM at scale; the size-guarded
    // plan must degrade to a plain shuffled join instead.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(k => spark.conf.set(k, "-1"))
      val df = LlmOps.q72DedupPurge(spark, d)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
        s"purge join must not broadcast when the removal set exceeds the threshold:\n$plan")
      // and the guarded plan computes the identical audit
      saved.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      val expected = LlmOps.q72DedupPurge(spark, d).collect()
      assert(rows.sameElements(expected))
    } finally {
      saved.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }
}
