package graft.queries

import graft.SparkSpec

class BpeMergeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: String*) = rows.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("pair weights are word-type frequencies, not token positions") {
    // "abab" x3, "ab" x2: pair "a b" occurs twice per "abab" type and
    // once in "ab" -> weight 2*3 + 1*2 = 8, contexts 3 (2 in abab, 1 in ab).
    val out = LlmOps.bpeMergeStep(docs("abab abab abab ab ab"))
      .as[(String, Long, Long)].collect()
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("a b") == (3L, 8L))
    assert(m("b a") == (1L, 3L), "internal b-a bridge only in abab")
    assert(m("b </w>") == (2L, 5L), "both types end in b")
    assert(out.head._1 == "a b", "top merge candidate is the a-b pair")
  }

  test("single-character words emit only the end-of-word pair") {
    val out = LlmOps.bpeMergeStep(docs("x x x"))
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("x </w>", 1L, 3L)))
  }

  test("case folding merges word types before weighting") {
    val out = LlmOps.bpeMergeStep(docs("Ab ab AB"))
      .as[(String, Long, Long)].collect()
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("a b") == (1L, 3L), "one folded type 'ab' with frequency 3")
  }

  test("q98 on the fixture: bounded top-20, total order, positive weights") {
    val out = LlmOps.q98BpeMergeStep(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (pair, n, w) =>
      assert(pair.split(" ", 2).length == 2)
      assert(n >= 1L && w >= n, "weight sums freqs >= contexts")
    }
    val key = out.map(r => (-r._3, r._1)).toSeq
    assert(key == key.sorted, "rows must arrive in (weight desc, pair) order")
  }
}
