package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** BigInt reference replay of the documented recurrence. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
                        scale: Long = 1000000L,
                        num: Long = 85L, den: Long = 100L): Map[String, Long] = {
    val base = BigInt(scale) * (den - num) / den
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> BigInt(es.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> BigInt(scale)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, d, w) => d -> (r(s) * w / outw(s)) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (base + num * contrib.getOrElse(n, BigInt(0)) / den)).toMap
    }
    r.map { case (k, v) => k -> v.toLong }
  }

  test("crafted graph matches the BigInt recurrence exactly") {
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L))
    val got = PageRank.ranks(edges.toDF("s", "t", "w"), "s", "t", "w", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == reference(edges, 3))
    // d has no in-edges: it holds exactly base + 0 after any iteration
    assert(got("d") == 150000L)
  }

  test("mass conservation bound: total rank never exceeds nodes * scale") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L))
    val got = PageRank.ranks(edges.toDF("s", "t", "w"), "s", "t", "w", iters = 5)
      .as[(String, Long)].collect()
    assert(got.length == 3)
    assert(got.map(_._2).sum <= 3L * 1000000L,
      "floor divisions only ever leak mass, never create it")
    assert(got.forall(_._2 >= 150000L), "every node keeps at least the base share")
  }

  test("fixture TextRank: deterministic across invocations, plausible head") {
    val d = "/root/testdata/sf0.001"
    val a = graft.queries.Corpus.q87TextRank(spark, d).as[(String, Long)].collect()
    val b = graft.queries.Corpus.q87TextRank(spark, d).as[(String, Long)].collect()
    assert(a.toSeq == b.toSeq, "independent runs must agree exactly")
    assert(a.length == 20)
    val scores = a.map(_._2)
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      "output must arrive sorted by rank_score desc")
    // the rare 'dup' token cannot out-rank the head of the common vocab
    assert(!a.take(5).map(_._1).contains("dup"))
  }
}
