package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant coverage for the q101–q106 audit surface. These queries are
  * oracled end-to-end by the DuckDB gate; the specs here pin the
  * STRUCTURAL contracts a hash compare cannot name — reconciliation
  * between composed queries (q101 vs q44), partition/bound laws, and
  * total-order guarantees — on the sf0.001 fixture.
  */
class SurfaceAuditSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q101 flow matrix reconciles with the q44 pair list it rolls up") {
    val pairTotal = LlmOps.q44LshPairs(spark, d).count()
    val flow = LlmOps.q101NearDupFlow(spark, d)
      .as[(String, String, Long)].collect()
    assert(flow.map(_._3).sum == pairTotal,
      "every q44 pair lands in exactly one flow cell")
    flow.foreach { case (a, b, n) =>
      assert(a <= b, "canonical (least, greatest) triangle")
      assert(n > 0)
    }
    assert(flow.map(c => (c._1, c._2)).distinct.length == flow.length)
  }

  test("q102 lexical statistics obey count orderings and ppm bounds") {
    val rows = Corpus.q102VocabGrowth(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTokens, vocab, hapax, dis, hapaxPpm, ttrPpm) =>
      assert(hapax + dis <= vocab, "hapax and dis legomena are disjoint vocab subsets")
      assert(vocab <= nTokens, "each type occurs at least once")
      assert(hapaxPpm == hapax * 1000000L / vocab)
      assert(ttrPpm == vocab * 1000000L / nTokens)
    }
  }

  test("q103 vocabulary overlap is a bounded canonical triangle vs per-source vocab") {
    val vocabBySource = graft.sources.Layouts.documents(spark, d)
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .distinct().groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val rows = Corpus.q103SourceOverlap(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, va, vb, j) =>
      assert(a < b, "strict upper triangle")
      assert(va == vocabBySource(a) && vb == vocabBySource(b),
        "sizes are the true per-source vocabularies")
      assert(inter <= math.min(va, vb))
      assert(j == inter * 1000000L / (va + vb - inter))
    }
  }

  test("q104 verdict counts partition the pairs; envelope is ordered") {
    val rows = LlmOps.q104LshCalibration(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, n, over, under, exact, lo, hi) =>
      assert(m >= 32 && m <= 64, "minJaccard 0.5 at k=64 admits matches in [32, 64]")
      assert(over + under + exact == n, "every pair gets exactly one verdict")
      assert(lo <= hi && lo >= 0 && hi <= 1000000L)
    }
    // levels are distinct and the output order is matches DESC
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
  }

  test("q105 purity is a majority share over the true per-source total") {
    val rows = LlmOps.q105LabelPurity(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, nLabels, _, topN, ppm) =>
      assert(topN <= nDocs && nLabels >= 1)
      assert(topN * nLabels >= nDocs, "the max cell is at least the mean cell")
      assert(ppm == topN * 1000000L / nDocs)
    }
  }

  test("q106 recall histogram carries every query point once, overlap within [0, K]") {
    val rows = LlmOps.q106IvfRecall(spark, d)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val nQueries = graft.Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(50L)) === 0 && col("vec_id") < lit(50000L))
      .count()
    assert(rows.map(_._2).sum == nQueries, "histogram mass = sampled query count")
    rows.foreach { case (overlap, n) =>
      assert(overlap >= 0 && overlap <= 10)
      assert(n > 0)
    }
  }
}
