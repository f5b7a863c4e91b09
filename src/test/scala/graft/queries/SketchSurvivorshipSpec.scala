package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant + cross-query reconciliation coverage for the round-9
  * additions: q123 (mergeable HLL vocabulary rollup), q124 (theta-sketch
  * vocabulary set algebra), q125 (quality-ranked survivorship).
  */
class SketchSurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q123 sketch rollup: parts/exact reconcile and every HLL verdict holds") {
    val rows = Corpus.q123SketchRollup(spark, d)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), s"HLL estimate outside 5% of exact: $rows")
    // independent exact recomputation straight off the raw fixture
    val exact = graft.Tables.documents(spark, d)
      .select(col("source"), col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("source")
      .agg(countDistinct("lang").as("n_parts"), countDistinct("w").as("vocab"))
      .as[(String, Long, Long)].collect().toSeq
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (src, parts, vocab, _) =>
      assert(exact(src) == ((parts, vocab)),
        s"$src: got ($parts, $vocab), expected ${exact(src)}")
    }
  }

  test("q124 theta overlap: exact intersections equal q103's and verdicts hold") {
    val theta = Corpus.q124ThetaOverlap(spark, d)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(theta.nonEmpty)
    assert(theta.forall(_._4), s"theta estimate outside bound: $theta")
    // q103 computes the same exact intersection with independent plumbing
    val q103 = Corpus.q103SourceOverlap(spark, d)
      .select("source_a", "source_b", "inter")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(theta.size == q103.size, "pair sets must coincide")
    theta.foreach { case (a, b, inter, _) =>
      assert(q103((a, b)) == inter, s"($a,$b): $inter vs q103 ${q103((a, b))}")
    }
  }

  test("q125 survivorship: totals reconcile with q72 and flips pair up") {
    val q125 = LlmOps.q125CanonicalPick(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val q72 = LlmOps.q72DedupPurge(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    // per-source doc totals agree with q72's
    assert(q125.map(r => r._1 -> r._2).toMap == q72.map(r => r._1 -> r._2).toMap)
    q125.foreach { case (src, n, kept, removed, flips) =>
      assert(kept + removed == n, s"$src: kept+removed != n_docs")
      assert(flips <= n, s"$src: more flips than docs")
    }
    // clusters span sources, so flips only bound GLOBALLY: each flipped
    // cluster contributes exactly one kept-flip and one removed-flip,
    // and every flipped-removed doc is a removed doc somewhere
    assert(q125.map(_._5).sum <= 2 * q125.map(_._4).sum,
      "global flips exceed 2x global removals")
    // both policies remove exactly (cluster_size - 1) docs per cluster,
    // so the GLOBAL removal mass must be identical even when the
    // per-source split differs
    assert(q125.map(_._3).sum == q72.map(_._3).sum, "global kept mass differs")
    // a flip is one doc the quality policy keeps where min-id removed it
    // plus one it removes where min-id kept it — they come in pairs
    assert(q125.map(_._5).sum % 2 == 0, "global flip count must be even")
  }
}
