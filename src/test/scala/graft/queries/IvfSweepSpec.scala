package graft.queries

import graft.SparkSpec

/** q195's sweep arithmetic on a crafted corpus with fully known cell
  * ranking and exact top-K — recall and scanned-share hand-computed per
  * probe width, plus the frontier invariants.
  */
class IvfSweepSpec extends SparkSpec {
  import spark.implicits._

  private def vec(axis: Int, lean: Double): Array[Float] = {
    val a = Array.fill(8)(0.0f)
    a(axis) = 1.0f
    a(0) = (a(0) + lean).toFloat
    a
  }

  /** query (id 0, in cell A) on e0; cell A leans strongest toward e0,
    * B medium, C orthogonal. Exact top-10 vs e0 = A's 6 members
    * (cos .57–.69) then B's best 4 (cos .44–.55). */
  private def corpus = {
    val a = (0 until 6).map(i => (1L + i, "A", vec(1, 0.95 - 0.05 * i)))
    val b = (0 until 6).map(i => (11L + i, "B", vec(2, 0.65 - 0.05 * i)))
    val c = (0 until 6).map(i => (21L + i, "C", vec(3, 0.0)))
    (Seq((0L, "A", vec(0, 0.0))) ++ a ++ b ++ c)
      .toDF("vec_id", "label", "embedding")
  }

  test("recall and scanned share are exact per probe width") {
    val rows = LlmOps.ivfSweep(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    // p=1 probes cell A (7 members incl. the query): 6 candidates, all
    // exact top-10 members -> 6 hits of 10
    assert(rows(1L).getLong(3) == 600000L, s"p=1 recall: ${rows(1L)}")
    assert(rows(1L).getLong(4) == 7L && rows(1L).getLong(5) == 368421L,
      s"p=1 scanned 7/19: ${rows(1L)}")
    // p=2 adds cell B: top-10 of A∪B = exactly the exact top-10
    assert(rows(2L).getLong(3) == 1000000L, s"p=2 recall: ${rows(2L)}")
    assert(rows(2L).getLong(4) == 13L)
    // only 3 cells exist: p=3 and p=4 plateau at full recall
    assert(rows(3L).getLong(3) == 1000000L && rows(4L).getLong(3) == 1000000L)
    assert(rows(3L).getLong(4) == 19L && rows(4L).getLong(4) == 19L)
    assert(rows.values.forall(_.getLong(1) == 1L), "one query in the panel")
  }

  test("frontier invariants: recall and scanned cost are non-decreasing in nprobe") {
    val rows = LlmOps.ivfSweep(corpus).collect().sortBy(_.getLong(0))
    val recalls = rows.map(_.getLong(3)).toSeq
    val scanned = rows.map(_.getLong(4)).toSeq
    assert(recalls == recalls.sorted, s"recall must be monotone: $recalls")
    assert(scanned == scanned.sorted, s"cost must be monotone: $scanned")
  }

  test("a query whose best cell is its own singleton still sweeps cleanly") {
    // the query's own cell has no other member: p=1 retrieves nothing
    val docs = (Seq((0L, "Q", vec(0, 0.0))) ++
      (0 until 12).map(i => (1L + i, "B", vec(1, 0.9 - 0.05 * i))))
      .toDF("vec_id", "label", "embedding")
    val rows = LlmOps.ivfSweep(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // cell Q (centroid = the query itself) ranks first, contributes no
    // candidates; recall climbs only once B is probed
    assert(rows(1L).getLong(3) == 0L)
    assert(rows(2L).getLong(3) == 1000000L)
  }
}
