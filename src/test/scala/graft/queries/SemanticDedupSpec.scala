package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-duplicate coverage for [[LlmOps.semanticDedupAudit]] (q77):
  * crafted embeddings where the expected assignment, removal set, and
  * chain resolution are known by construction.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim unit-ish vectors; cell 100 points along e1, cell 200 along e2
  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  private val centroids = df(Seq(
    100L -> Seq(1f, 0f, 0f, 0f),
    200L -> Seq(0f, 1f, 0f, 0f)))
    .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))

  test("near-identical cell-mates: higher id removed, lower kept") {
    val e = df(Seq(
      10L -> Seq(0.99f, 0.05f, 0f, 0f),   // cell 100
      11L -> Seq(0.98f, 0.06f, 0f, 0f),   // semantic dup of 10 -> removed
      20L -> Seq(0.05f, 0.99f, 0f, 0f),   // cell 200
      21L -> Seq(-0.9f, 0f, 0f, 0.44f)))  // cell 200 is its best of the two seeds
    val audit = LlmOps.semanticDedupAudit(e, centroids, tau = 0.9, maxCell = 100L)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    // cell 100: members {10, 11}, 11 removed (cos ~ 1); cell 200:
    // members {20, 21}, nearly orthogonal -> nothing removed
    assert(audit.map(a => (a._1, a._2, a._3, a._4)) ==
      List((100L, 2L, 1L, 1L), (200L, 2L, 0L, 2L)))
    assert(audit.head._5 > 0.99)
  }

  test("chain a~b~c with a!~c: only the chain's lowest id survives") {
    // b similar to a, c similar to b but not to a (documented keep rule:
    // x is removed iff ANY lower-id cell-mate is tau-similar, so c is
    // removed through its similarity to the already-removed b)
    val a = Seq(1f, 0.0f, 0.1f, 0f)
    val b = Seq(1f, 0.1f, 0.05f, 0f)
    val c = Seq(1f, 0.2f, 0.0f, 0f)
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val xd = x.map(_.toDouble); val yd = y.map(_.toDouble)
      val dot = xd.zip(yd).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(xd.map(v => v * v).sum) * math.sqrt(yd.map(v => v * v).sum))
    }
    val tau = 0.985
    assert(cos(a, b) >= tau && cos(b, c) >= tau && cos(a, c) < tau,
      s"fixture must form a chain: ab=${cos(a, b)} bc=${cos(b, c)} ac=${cos(a, c)}")
    val e = df(Seq(10L -> a, 11L -> b, 12L -> c))
    val audit = LlmOps.semanticDedupAudit(e, centroids, tau = tau, maxCell = 100L)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(audit == List((100L, 3L, 2L, 1L, audit.head._5)))
  }

  test("cells above maxCell are excluded; singleton cells never audited") {
    val big = (0 until 6).map(i => (30L + i) -> Seq(1f, i * 0.01f, 0f, 0f))
    val single = Seq(50L -> Seq(0f, 1f, 0f, 0f))
    val e = df(big ++ single)
    val audit = LlmOps.semanticDedupAudit(e, centroids, tau = 0.9, maxCell = 5L)
      .collect()
    assert(audit.isEmpty,
      "an over-bound cell and a singleton cell must both be excluded")
  }

  test("q77 on the fixture: audit partitions every live cell; dups found") {
    val d = "/root/testdata/sf0.001"
    val audit = LlmOps.q77SemanticDedup(spark, d)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(audit.nonEmpty)
    audit.foreach { case (cell, n, removed, kept, maxSim) =>
      assert(kept + removed == n, s"cell $cell: kept+removed must equal members")
      assert(removed >= 0 && kept >= 1, s"cell $cell: at least the lowest id survives")
      assert(maxSim <= 1.0001, s"cell $cell: cosine bound violated: $maxSim")
    }
  }
}
