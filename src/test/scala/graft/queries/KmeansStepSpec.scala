package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q81 coverage: the update rule's arithmetic verified by hand on
  * crafted vectors, plus partition/range invariants on the fixture
  * (engine/oracle parity is the correctness gate's job).
  */
class KmeansStepSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("crafted cells: exact member mean, hand-computed scaled L1 drift") {
    val cents = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f))).toDF("cell_id", "c_emb")
    // cell 1 members: (1,0,0,0) [the seed itself] and (0.5,0,0,0) —
    // same direction, cosine 1 to seed 1, orthogonal to seed 2
    // cell 2 member: (0,0.25,0,0)
    val e = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),
      (11L, Seq(0.5f, 0f, 0f, 0f)),
      (20L, Seq(0f, 0.25f, 0f, 0f))).toDF("vec_id", "embedding")
    val audit = LlmOps.kmeansUpdateAudit(e, cents)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    val S = 1048576L // 2^20
    // cell 1: n=2; dim0: |2*S - (S + S/2)| = S/2; other dims zero
    // cell 2: n=1; dim1: |1*S - S/4| = 3S/4
    assert(audit == List(
      (1L, 2L, S / 2, (S + S / 2).toDouble / (2 * S)),
      (2L, 1L, 3 * S / 4, 0.0)))
  }

  test("fixture: cells partition the corpus; drift positive; means in range") {
    val audit = LlmOps.q81KmeansStep(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    val seeds = graft.Tables.embeddings(spark, d)
      .filter(col("vec_id") % 64 === 0).select("vec_id")
      .as[Long].collect().toSet
    assert(audit.map(_._1).toSet == seeds,
      "every corpus-proportional seed cell must be populated on the fixture")
    assert(seeds.size == 8, "sf0.001 has 500 dense ids -> 8 stride-64 seeds")
    val total = graft.Tables.embeddings(spark, d).count()
    assert(audit.map(_._2).sum == total, "cell membership must partition the corpus")
    audit.foreach { case (cell, n, drift, c0) =>
      assert(n >= 1L && drift >= 0L)
      assert(c0.abs <= 1.5, s"cell $cell: dim-0 mean $c0 outside unit-ish range")
    }
    assert(audit.map(_._3).sum > 0L, "total drift must be positive on the fixture")
  }
}
