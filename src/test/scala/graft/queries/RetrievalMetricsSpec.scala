package graft.queries

import graft.SparkSpec

/** q194's metric arithmetic against a crafted vector layout with fully
  * known ranks — MRR/hit@k/NDCG hand-computed with the same literal
  * discount table the query embeds.
  */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  // the literal tables q194 embeds (recomputed independently here)
  private val W: Seq[Long] =
    (1 to 10).map(r => Math.round(1e6 / (Math.log(r + 1.0) / Math.log(2.0))))
  private val P: Seq[Long] = W.scanLeft(0L)(_ + _).tail

  /** Vectors on distinct near-orthogonal axes with controlled cosine to
    * the query axis: v(axis, lean) = e_axis + lean·e_0 — higher lean ⇒
    * higher cosine to e_0, so ranks against query 0 are fully chosen.
    */
  private def vec(axis: Int, lean: Double): Array[Float] = {
    val a = Array.fill(8)(0.0f)
    a(axis) = 1.0f
    a(0) = (a(0) + lean).toFloat
    a
  }

  test("MRR / hit@k / NDCG reproduce the hand calculation exactly") {
    // query: vec_id 0 (0 % 50 == 0), label "A", pure e_0.
    // corpus ranks vs e_0 by descending lean:
    //   rank1: id 10, label B (lean .9)  -> irrelevant
    //   rank2: id 11, label A (lean .8)  -> relevant (first_rel = 2)
    //   rank3: id 12, label B (lean .7)
    //   rank4: id 13, label A (lean .6)  -> relevant
    //   rank5..: id 14..19 label B (lean .5 down) -> irrelevant
    val rows = Seq((0L, "A", vec(0, 0.0))) ++
      (0 until 10).map { i =>
        val label = if (i == 1 || i == 3) "A" else "B"
        (10L + i, label, vec(i % 7 + 1, 0.9 - 0.1 * i))
      }
    val got = LlmOps.retrievalMetrics(rows.toDF("vec_id", "label", "embedding"))
      .collect().map(r => r.getString(0) -> r).toMap
    // only label A has a sampled query (vec_id 0)
    assert(got.keySet == Set("A"))
    val a = got("A")
    assert(a.getLong(1) == 1L, "one query")
    // MRR: first relevant at rank 2 -> 1/2
    assert(a.getLong(2) == 500000L, s"mrr, got ${a.getLong(2)}")
    assert(a.getLong(3) == 0L, "hit@1: rank1 is irrelevant")
    assert(a.getLong(4) == 1000000L, "hit@5")
    assert(a.getLong(5) == 1000000L, "hit@10")
    // DCG = W(2) + W(4); corpus holds 2 other A docs -> IDCG = P(2)
    val want = (BigInt(W(1) + W(3)) * 1000000 / BigInt(P(1))).toLong
    assert(a.getLong(6) == want, s"ndcg, got ${a.getLong(6)} want $want")
  }

  test("a query whose label has no other members yields zero/NULL cleanly") {
    val rows = Seq((0L, "solo", vec(0, 0.0))) ++
      (0 until 10).map(i => (10L + i, "B", vec(i % 7 + 1, 0.5)))
    val got = LlmOps.retrievalMetrics(rows.toDF("vec_id", "label", "embedding"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s0 = got("solo")
    assert(s0.getLong(2) == 0L && s0.getLong(5) == 0L, "no relevant anywhere")
    assert(s0.isNullAt(6), "idcg 0 -> NDCG NULL, never a division crash")
  }

  test("perfect retrieval scores 10^6 across the board") {
    // 11 label-A vectors tightly aligned; 10 B vectors orthogonal
    val rows = Seq((0L, "A", vec(0, 0.0))) ++
      (0 until 10).map(i => (1L + i, "A", vec(0, 0.01 * (i + 1)))) ++
      (0 until 10).map(i => (100L + i, "B", vec(i % 7 + 1, 0.0)))
    val got = LlmOps.retrievalMetrics(rows.toDF("vec_id", "label", "embedding"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(2) == 1000000L && a.getLong(3) == 1000000L &&
      a.getLong(6) == 1000000L,
      s"perfect panel: $a")
  }
}
