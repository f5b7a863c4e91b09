package graft.queries

import graft.SparkSpec

/** Pins the q109 trainer semantics the fixture oracle cannot name:
  * greedy LEFTMOST-NON-OVERLAPPING merge application inside symbol runs
  * (the `aaaa` case), consumed-successor deletion, total tie-breaking on
  * the merge selection, and cross-round state threading on crafted
  * corpora computed by hand.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def train(words: (String, Int)*): Seq[(Long, String, String, Long, Long)] = {
    val docs = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .toDF("text")
    LlmOps.bpeTrain(docs)
      .as[(Long, String, String, Long, Long)].collect().toSeq
  }

  test("aaaa: run of eligible positions merges at odd offsets only") {
    // "aaaa" -> a a a a </w>; (a,a) occurs at 3 adjacent positions but
    // greedy leftmost merges only positions 1 and 3 -> aa aa </w>
    val m = train("aaaa" -> 2)
    assert(m.head == ((1L, "a", "a", 6L, 3L)),
      "weight counts ALL 3 overlapping contexts, merge applies at 2")
    // round 2: state [aa, aa, </w>] -> (aa,aa) vs (aa,</w>) tie at weight
    // 2; b ascending picks "</w>" ('<' sorts below 'a')
    assert(m(1) == ((2L, "aa", "</w>", 2L, 1L)))
    // round 3: state [aa, aa</w>]
    assert(m(2) == ((3L, "aa", "aa</w>", 2L, 1L)))
  }

  test("aaa: consumed successor is not merged again; tiebreak on a then b") {
    // "aaa" -> a a a </w>; eligible at positions 1,2 -> merge 1 only
    // (position 2's left symbol was consumed) -> aa a </w>
    val m = train("aaa" -> 4)
    assert(m.head == ((1L, "a", "a", 8L, 2L)))
    // state [aa, a, </w>]: (aa,a) and (a,</w>) tie at 4; a ascending
    // picks the pair starting at "a"
    assert(m(1) == ((2L, "a", "</w>", 4L, 1L)))
    // state [aa, a</w>]
    assert(m(2) == ((3L, "aa", "a</w>", 4L, 1L)))
  }

  test("frequency weighting: a rarer type with longer runs can outweigh a common short one") {
    // "ab" x5 contributes (a,b) weight 5; "aaaa" x2 contributes (a,a)
    // weight 6 from 3 overlapping contexts — types, not tokens, weighted
    val m = train("ab" -> 5, "aaaa" -> 2)
    assert(m.head._2 == "a" && m.head._3 == "a" && m.head._4 == 6L)
  }

  test("merge table is deterministic across runs") {
    val a = train("ab" -> 3, "abab" -> 2, "b" -> 7)
    val b = train("ab" -> 3, "abab" -> 2, "b" -> 7)
    assert(a == b)
    assert(a.map(_._1) == Seq(1L, 2L, 3L))
  }
}
