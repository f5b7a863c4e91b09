package graft.queries

import graft.SparkSpec
import graft.functions.PolyHash

/** Score-parity coverage for the q78 hashing-trick classifier: crafted
  * documents whose expected logits are recomputed independently in plain
  * Scala from the same published constants (hash mod 1e9+7, 1024 buckets,
  * w(j) = ((j*37+11) mod 21) - 10).
  */
class QualityScoreSpec extends SparkSpec {
  import spark.implicits._

  private def expectedLogit(text: String): Long =
    text.trim.split("\\s+").map { tok =>
      val j = PolyHash.horner(tok) % 1024L
      (j * 37L + 11L) % 21L - 10L
    }.sum

  test("per-doc logits match an independent replay of the model") {
    val docs = Seq(
      (1L, "srcA", "the quick brown fox jumps over the lazy dog"),
      (2L, "srcA", "lorem ipsum dolor sit amet consectetur"),
      (3L, "srcB", "to be or not to be that is the question"),
      (4L, "srcB", "x")).toDF("doc_id", "source", "text")
    val got = LlmOps.qualityLogits(docs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    val want = Map(
      1L -> expectedLogit("the quick brown fox jumps over the lazy dog"),
      2L -> expectedLogit("lorem ipsum dolor sit amet consectetur"),
      3L -> expectedLogit("to be or not to be that is the question"),
      4L -> expectedLogit("x"))
    assert(got == want, s"got $got, want $want")
  }

  test("identical tokens score identically regardless of order (bag model)") {
    val docs = Seq(
      (1L, "s", "alpha beta gamma"),
      (2L, "s", "gamma alpha beta")).toDF("doc_id", "source", "text")
    val logits = LlmOps.qualityLogits(docs)
      .as[(Long, String, Long)].collect().map(_._3).distinct
    assert(logits.length == 1, "a linear bag-of-words model must be order-blind")
  }

  test("q78 audit on the fixture: keep counts within totals, avg exact") {
    val d = "/root/testdata/sf0.001"
    val audit = LlmOps.q78QualityScore(spark, d)
      .as[(String, Long, Long, Double)].collect()
    assert(audit.nonEmpty)
    audit.foreach { case (src, n, keep, avg) =>
      assert(keep >= 0 && keep <= n, s"$src: keep must be within [0, n]")
      assert(avg.abs < 10.0 * 1000, s"$src: avg score out of any plausible range")
    }
    // totals must cover the corpus
    val total = graft.Tables.documents(spark, d).count()
    assert(audit.map(_._2).sum == total)
  }
}
