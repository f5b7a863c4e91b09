package graft.queries

import graft.SparkSpec

/** q212's cross-modal protocol on crafted vectors with hand-computable
  * metrics — pinning the two places it deliberately differs from q194:
  * the ideal-DCG pool has NO self exclusion (queries are never in the
  * candidate modalities), and a label with no candidate-pool relevants
  * degrades to NULL ndcg instead of dropping the query row.
  *
  * Panel rule reminder: queries are kind-0 vectors with vec_id % 20 == 0.
  */
class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  private def axis(i: Int, v: Float = 1.0f): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    a(i) = v
    a
  }

  // label 1: one query (id 20) + ONE exactly-aligned relevant candidate
  //   (id 1, kind 1) and an orthogonal irrelevant one (id 2) — relevant
  //   ranks 1, lc = 1, so ndcg must be EXACTLY 10^6 (W(1)/P(1)); were
  //   the pool self-excluded like q194 (lc - 1 = 0), ndcg would be NULL
  // label 2: one query (id 40) whose label has NO candidate-pool member
  //   — first_rel NULL, mrr/hits 0, ndcg NULL, and the row still EXISTS
  private def corpus = Seq(
    (20L, 1, axis(0), 0),
    (1L, 1, axis(0, 0.5f), 1),
    (2L, 3, axis(5), 2),
    (40L, 2, axis(1), 0),
    (3L, 3, axis(6), 1))
    .toDF("vec_id", "label", "embedding", "kind")

  test("perfect single-relevant retrieval scores ndcg exactly 10^6 (no self exclusion)") {
    val rows = LlmOps.crossModalMetrics(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    val l1 = rows(1L)
    assert(l1.getLong(1) == 1L, s"one query: $l1")
    assert(l1.getLong(2) == 1000000L, s"mrr: $l1")   // first_rel = 1
    assert(l1.getLong(3) == 1000000L, s"hit1: $l1")
    assert(l1.getLong(6) == 1000000L, s"ndcg with lc=1 pool: $l1")
  }

  test("a label with zero candidate-pool relevants keeps its row with NULL ndcg") {
    val rows = LlmOps.crossModalMetrics(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    val l2 = rows(2L)
    assert(l2.getLong(1) == 1L && l2.getLong(2) == 0L && l2.getLong(3) == 0L)
    assert(l2.isNullAt(6), s"ndcg must be NULL when idcg = 0: $l2")
  }

  test("fixture: per-label query counts reconcile and metrics are bounded") {
    val kindExpr = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("source"), 4, 10).cast("int"),
      org.apache.spark.sql.functions.lit(3))
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.embeddings(spark, d)
      .join(graft.Tables.documents(spark, d)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          kindExpr.as("kind")),
        org.apache.spark.sql.functions.col("vec_id") ===
          org.apache.spark.sql.functions.col("doc_id"))
      .select("vec_id", "label", "embedding", "kind")
    val out = LlmOps.crossModalMetrics(ev).collect()
    val nq = ev.filter("kind = 0 AND vec_id % 20 = 0 AND vec_id < 20000").count()
    assert(out.map(_.getLong(1)).sum == nq, "every panel query lands in one label row")
    assert(out.forall { r =>
      Seq(2, 3, 4, 5).forall(i => r.getLong(i) >= 0 && r.getLong(i) <= 1000000L) &&
        (r.isNullAt(6) || (r.getLong(6) >= 0 && r.getLong(6) <= 1000000L))
    })
  }
}
