package graft.queries

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val words = (1 to 40).map(i => s"w$i")

  test("a document fully embedded in a longer one reports 100% containment") {
    val short = words.take(12).mkString(" ")
    val long = (Seq("pre1 pre2 pre3 pre4") ++ words.take(12) ++
      Seq("post1 post2 post3 post4")).mkString(" ")
    val other = (100 to 140).map(i => s"z$i").mkString(" ")
    val out = LlmOps.containmentAudit(docs(1L -> short, 2L -> long, 3L -> other))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (a, b, inter, sa, sb, cont) = out.head
    assert((a, b) == (1L, 2L))
    assert(sa == 9L, "12 tokens -> 9 distinct 4-gram shingles")
    assert(inter == 9L && cont == 1000000L)
    assert(sb > sa, "container profile is larger")
  }

  test("symmetric low-overlap pairs stay below the 50% threshold") {
    val a = words.take(20).mkString(" ")
    val b = (words.take(6) ++ (200 to 220).map(i => s"y$i")).mkString(" ")
    val out = LlmOps.containmentAudit(docs(1L -> a, 2L -> b)).collect()
    // shared prefix gives 3 shared shingles vs min profile ~18 — below 50%
    assert(out.isEmpty)
  }

  test("shingles above the df cap do not generate candidates") {
    // 60 documents sharing one boilerplate sentence (df=60 > 50): the
    // boilerplate alone must not produce any pair.
    val boiler = "terms of service apply here now"
    val rows = (1L to 60L).map(i => i -> s"$boiler unique${i}a unique${i}b")
    val out = LlmOps.containmentAudit(docs(rows: _*)).collect()
    assert(out.isEmpty)
  }

  test("q97 on the fixture: planted dups found, values exact, order total") {
    val out = LlmOps.q97Containment(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    out.foreach { case (a, b, inter, sa, sb, cont) =>
      assert(a < b)
      assert(inter <= math.min(sa, sb))
      assert(cont == inter * 1000000L / math.min(sa, sb))
      assert(cont >= 500000L)
    }
    val key = out.map(r => (-r._6, r._1, r._2)).toSeq
    assert(key == key.sorted, "rows must arrive in (cont desc, doc_a, doc_b) order")
  }
}
