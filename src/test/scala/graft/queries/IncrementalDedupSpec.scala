package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q79 contract coverage: the incremental pass emits ONLY new-vs-old and
  * new-vs-new pairs, agrees pair-for-pair with a batch q44 rebuild
  * restricted to at-least-one-new, and reads the old corpus's bands from
  * the maintained index layout instead of re-banding it.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def isNew(id: Long): Boolean = id % 10 >= 8

  test("only new-vs-old and new-vs-new pairs are emitted, correctly classified") {
    val pairs = LlmOps.q79IncrementalDedup(spark, d)
      .as[(Long, Long, String, Double)].collect()
    assert(pairs.nonEmpty, "fixture's planted near-dups must straddle the split")
    pairs.foreach { case (a, b, kind, est) =>
      assert(a < b, s"pair orientation violated: ($a, $b)")
      assert(isNew(a) || isNew(b), s"old-vs-old pair leaked: ($a, $b)")
      val expected = if (isNew(a) && isNew(b)) "new_new" else "new_old"
      assert(kind == expected, s"($a, $b) classified $kind, expected $expected")
      assert(est >= 0.5 && est <= 1.0)
    }
  }

  test("incremental output equals the batch rebuild restricted to >=1 new doc") {
    val incremental = LlmOps.q79IncrementalDedup(spark, d)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val batch = LlmOps.q44LshPairs(spark, d)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => isNew(a) || isNew(b) }.toSet
    assert(incremental == batch,
      s"incremental and batch must agree;\nonly-incremental=${incremental -- batch}\nonly-batch=${batch -- incremental}")
  }

  test("the old corpus's bands come from the index layout, not a re-band") {
    val plan = LlmOps.q79IncrementalDedup(spark, d)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("mhidx_bands_v1_"),
      s"plan must scan the maintained band index:\n$plan")
    assert(plan.contains("mhidx_sigs_v1_"),
      s"plan must scan the maintained signature index:\n$plan")
  }
}
