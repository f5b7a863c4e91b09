package graft.queries

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: String*) = rows.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("a bound pair outranks an equally-frequent independent pair") {
    // "alpha beta" always adjacent (4 of 4 alpha occurrences); "gamma"
    // and "delta" each appear 4 times but co-occur adjacently only once.
    val out = Corpus.collocationsAudit(docs(
      "alpha beta gamma delta",
      "alpha beta delta gamma",
      "alpha beta gamma delta",
      "alpha beta delta gamma"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    val ab = byPair(("alpha", "beta"))
    assert(ab._3 == 4L && ab._4 == 4L && ab._5 == 4L)
    assert(ab._6 == 4L * 1000000000L / 16L, "lift is exact integer arithmetic")
    // the bound pair leads the ranking
    assert(out.head._1 == "alpha" && out.head._2 == "beta")
    byPair.get(("gamma", "delta")).foreach { gd =>
      assert(gd._6 < ab._6, "independent pair scores below the bound pair")
    }
  }

  test("bigrams below the min-count threshold are dropped") {
    val out = Corpus.collocationsAudit(docs(
      "x y", "x y", // count 2 < 3
      "p q", "p q", "p q"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(("p", "q")))
  }

  test("single-token and empty documents emit no bigrams and do not crash") {
    val out = Corpus.collocationsAudit(docs(
      "solo", "", "a b", "a b", "a b"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
  }

  test("ordering is total (lift desc, w1, w2) and scores recompute from counts") {
    val out = Corpus.q95Collocations(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 100)
    out.foreach { case (_, _, cp, c1, c2, lift) =>
      assert(cp >= 3L)
      assert(lift == cp * 1000000000L / (c1 * c2))
    }
    val key = out.map(r => (-r._6, r._1, r._2)).toSeq
    assert(key == key.sorted, "rows must arrive in (lift desc, w1, w2) order")
  }

  test("q95's final plan never re-reads the corpus (tagged single-explode)") {
    // The one parquet scan happens inside the eager localCheckpoint that
    // materializes the (tag, gram) counts; every downstream consumer
    // (unigram side ×2, bigram side) must read the checkpointed RDD, so
    // the final plan contains ZERO parquet scans.
    val plan = Corpus.q95Collocations(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0, s"corpus must not be re-read past the checkpoint, got $scans")
    assert(plan.contains("ExistingRDD"), "counts must come from the checkpoint")
  }
}
