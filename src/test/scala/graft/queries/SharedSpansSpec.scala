package graft.queries

import graft.SparkSpec

class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a verbatim 12-token span is found with its exact length") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val out = LlmOps.sharedSpansAudit(docs(
      1L -> s"a1 a2 a3 $shared z1 z2",
      2L -> s"b1 $shared y1 y2 y3 y4",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 12L, 1L)),
      "exactly the (1,2) pair, span 12, one qualifying island")
  }

  test("an 11-token overlap stays below the 12-token threshold") {
    val shared = (1 to 11).map(i => s"s$i").mkString(" ")
    val out = LlmOps.sharedSpansAudit(docs(
      1L -> s"a1 a2 $shared z1",
      2L -> s"b1 b2 $shared y1")).collect()
    assert(out.isEmpty)
  }

  test("two disjoint spans in one pair count as separate islands") {
    val s1 = (1 to 12).map(i => s"p$i").mkString(" ")
    val s2 = (1 to 13).map(i => s"q$i").mkString(" ")
    val out = LlmOps.sharedSpansAudit(docs(
      1L -> s"$s1 mid1 mid2 $s2",
      2L -> s"$s2 other1 other2 other3 $s1"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 13L, 2L)),
      "max span 13 from the second block, two qualifying islands")
  }

  test("identical documents report the full document length") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = LlmOps.sharedSpansAudit(docs(5L -> text, 9L -> text))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((5L, 9L, 30L, 1L)))
  }

  test("spans of ultra-common grams are sacrificed by the frequency cap") {
    // 70 copies of the same text: every gram occurs 70 > 64 times, so the
    // guard drops them all and no pair is reported — the documented trade
    val text = (1 to 20).map(i => s"v$i").mkString(" ")
    val many = (1L to 70L).map(_ -> text)
    val out = LlmOps.sharedSpansAudit(docs(many: _*)).collect()
    assert(out.isEmpty, "capped grams must not explode into cap^2 pairs")
  }
}
