package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupGuardSpec extends SparkSpec {
  import spark.implicits._

  // 3 cells: a healthy pair-cell, a singleton, and a degenerate 50-vector
  // cell (1225 pairs if joined)
  private def fixture = {
    val healthy = Seq(
      (0, 1L, Array(1.0f, 0.0f)), (0, 2L, Array(0.9f, 0.1f)),
      (1, 3L, Array(0.0f, 1.0f)))
    val degenerate = (0 until 50).map(i => (2, 100L + i, Array(0.5f, 0.5f)))
    (healthy ++ degenerate).toDF("label", "vec_id", "embedding")
  }

  test("maxCell guard excludes a degenerate cell from the quadratic join") {
    val guarded = LlmOps.embeddingNearDupStats(
      fixture, "label", "vec_id", "embedding", simThreshold = 0.5, maxCell = 10L)
      .collect()
    assert(guarded.map(_.getLong(0)).toSeq == Seq(0L),
      "only the healthy cell may survive (singletons pairless, degenerate guarded)")
    assert(guarded.head.getLong(1) == 1L) // C(2,2) = 1 pair
  }

  test("without the guard the degenerate cell contributes its full pair count") {
    val unguarded = LlmOps.embeddingNearDupStats(
      fixture, "label", "vec_id", "embedding", simThreshold = 0.5, maxCell = 10000L)
      .collect()
    assert(unguarded.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (2L, 1225L))) // C(50,2) = 1225
  }

  test("decontamination flags exactly the cross-split near-dups, not background collisions") {
    // the fixture plants near-dup pairs (285,301) and (92,450); under the
    // doc_id % 5 benchmark split, 285 and 450 land in the benchmark and
    // their twins 301 and 92 in the train set — those two, and only
    // those, must cross the contamination threshold. Background 20-char
    // collisions exist (<= 3 per doc) and must stay below it.
    val rows = LlmOps.q45Decontaminate(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val flagged = rows.filter(_._3).map(_._1).toSet
    assert(flagged == Set(92L, 301L), s"contaminated set: $flagged")
    assert(rows.filter(!_._3).forall(_._2 < 10))
    assert(rows.count(!_._3) > 10, "background collisions should exist below threshold")
  }
}
