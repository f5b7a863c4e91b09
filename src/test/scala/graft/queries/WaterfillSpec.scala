package graft.queries

import graft.SparkSpec

/** q207's waterfilling algebra on a skewed corpus small enough to
  * hand-compute (the driver fixture's uniform sources never cap), plus
  * the budget-exactness invariant on the fixture.
  */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(caps: Seq[(String, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wf_").toString
    caps.zipWithIndex.map { case ((src, k), i) =>
      val text = Seq.fill(k)("w").mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-computed level: small sources capped, remainder to first uncapped") {
    // caps 5,10,100,200 -> total 315, budget 126; capped prefix {5,10};
    // level = (126-15) div 2 = 55, remainder 1 -> the smaller uncapped
    // source gets 56, the larger 55; sum is exactly the budget
    val d = fixture(Seq("a" -> 5, "b" -> 10, "c" -> 100, "z" -> 200))
    val got = Corpus.q207TokenBudget(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      "a" -> ((5L, 5L, 1L)), "b" -> ((10L, 10L, 1L)),
      "c" -> ((100L, 56L, 0L)), "z" -> ((200L, 55L, 0L))))
  }

  test("a budget above the corpus takes every source whole") {
    // total 10, budget 4 -> wait: budget is fixed at 40%; craft instead
    // a corpus where 40% exceeds all but one source: caps 1,1,1,100
    // -> total 103, budget 41; capped {1,1,1}, level 38, rem 0
    val d = fixture(Seq("a" -> 1, "b" -> 1, "c" -> 1, "z" -> 100))
    val got = Corpus.q207TokenBudget(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "z" -> 38L))
  }

  test("fixture invariants: allocations are capped and sum to the budget") {
    val rows = Corpus.q207TokenBudget(spark, "/root/testdata/sf0.01").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(2)).sum == total * 2 / 5)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }
}
