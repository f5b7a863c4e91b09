package graft.queries

import graft.SparkSpec

/** q219's A/B protocol invariants: both variants price the SAME
  * held-out bigram set, the filtered variant trains on strictly fewer
  * tokens, and the whole readout is deterministic.
  */
class CurationAbSpec extends SparkSpec {

  private def rows() = LlmOps.q219CurationAb(spark, "/root/testdata/sf0.001")
    .collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("same held-out set under both variants; filter shrinks the train side") {
    val m = rows()
    assert(m.keySet == Set("full", "filtered"))
    val (fullT, fullN, _, _) = m("full")
    val (filtT, filtN, _, _) = m("filtered")
    assert(fullN == filtN, "the SCORED bigram multiset must be identical")
    assert(filtT < fullT, "the q78 filter must actually remove train mass")
  }

  test("readout is deterministic") {
    assert(rows() == rows())
  }
}
