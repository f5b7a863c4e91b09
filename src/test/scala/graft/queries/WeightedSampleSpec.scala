package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PolyHash

/** q80 contract coverage: the keep decision replays exactly in plain
  * Scala from the published constants, the selection is layout-invariant
  * (content-derived, not partition-derived), and acceptance follows the
  * clamped classifier weight.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def replay(text: String): (Long, Long, Boolean) = {
    val logit = text.trim.split("\\s+").map { tok =>
      val j = PolyHash.horner(tok) % 1024L
      (j * 37L + 11L) % 21L - 10L
    }.sum
    val wgt = math.max(math.min(logit + 50L, 100L), 1L)
    val h = PolyHash.horner("q80:" + text) % 1000000L
    (logit, wgt, h * 100L < wgt * 1000000L)
  }

  test("fixture audit matches an independent full replay of the decision rule") {
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val decisions = rows.map(r => replay(r._3))
      (src, rows.length.toLong, decisions.count(_._3).toLong,
        decisions.map(_._2).sum)
    }.toSet
    val got = LlmOps.q80WeightedSample(spark, d)
      .select("source", "n_docs", "n_kept", "sum_w")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"engine and replay disagree;\nonly-engine=${got -- want}\nonly-replay=${want -- got}")
  }

  test("selection is run-deterministic: no RNG or partition-id dependence") {
    val base = LlmOps.q80WeightedSample(spark, d).collect().toSeq
    val again = LlmOps.q80WeightedSample(spark, d).collect().toSeq
    assert(base == again, "repeated runs must select identically")
  }

  test("clamp extremes: a wgt=100 document is always kept; wgt stays in [1, 100]") {
    // find a token with positive weight, repeat it 60x: logit >= 60
    // clamps to wgt=100, and h < 1e6 < 100*1e4 means keep is certain
    val tok = Seq("query", "data", "join", "scan", "merge", "sort", "spark")
      .find(t => replay(t)._1 > 0)
    assert(tok.nonEmpty, "at least one probe token must have positive weight")
    val (logit, wgt, kept) = replay((tok.get + " ") * 60)
    assert(logit >= 60L && wgt == 100L && kept, s"logit=$logit wgt=$wgt kept=$kept")
    val lo = replay("")
    assert(lo._2 >= 1L && lo._2 <= 100L)
  }
}
