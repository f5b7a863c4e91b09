package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q83 invariants: the audit's totals reconcile exactly with q63's
  * clusters and q53's split rule, and span counts are consistent.
  */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("audit reconciles with an independent recomputation from q63 clusters") {
    val clusters = LlmOps.q63DedupClusters(spark, d)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val splitOf = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.ops.Splits.assign(col("doc_id"), Corpus.SplitCuts).as("split"))
      .as[(Long, String)].collect().toMap
    val want = clusters.groupBy(_._2).values
      .map(ms => (ms.map(m => splitOf(m._1)).distinct.length.toLong, ms.length.toLong))
      .groupBy(_._1)
      .map { case (n, cs) => (n, cs.size.toLong, cs.map(_._2).sum) }
      .toSet
    val got = LlmOps.q83SplitLeakage(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"got $got, want $want")
    // every clustered doc is audited exactly once
    assert(got.map(_._3).sum == clusters.length.toLong)
    // span counts bounded by the number of splits
    got.foreach { case (n, _, _) => assert(n >= 1L && n <= 3L) }
  }

  test("q166 semantic leakage equals a literal cell-pair cosine replay") {
    val vecs = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"),
        graft.ops.Splits.assign(col("vec_id"), Corpus.SplitCuts).as("split"))
      .as[(Long, Long, Array[Float], String)].collect().toSeq
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
      while (i < a.length) {
        xy += a(i).toDouble * b(i); xx += a(i).toDouble * a(i)
        yy += b(i).toDouble * b(i); i += 1
      }
      xy / (math.sqrt(xx) * math.sqrt(yy))
    }
    // replay the corpus-proportional seeding + argmax assignment: seeds
    // are every 64th vec_id, a vector's cell is its (csim, cell_id)-max
    // seed — the same tuple order as the engine's max_by struct
    val seeds = vecs.filter(_._1 % 64 == 0).map(v => (v._1, v._3))
    def cellOf(e: Array[Float]): Long =
      seeds.map { case (cid, ce) => (cos(e, ce), cid) }.max._2
    val byBlock = vecs.map(v => (v._1, v._2, v._3, v._4, cellOf(v._3)))
      .groupBy(v => (v._2, v._5)).filter(_._2.size <= 10000)
    val pairs = byBlock.toSeq.flatMap { case ((label, _), block) =>
      val train = block.filter(_._4 == "train")
      val eval = block.filter(_._4 != "train")
      for (ev <- eval; tr <- train)
        yield (ev._4, label, ev._1, cos(ev._3, tr._3))
    }
    val expected = pairs.groupBy(p => (p._1, p._2)).toSeq
      .map { case ((split, label), ps) =>
        (split, label,
          ps.map(_._3).distinct.size.toLong, ps.size.toLong,
          ps.filter(_._4 >= 0.4).map(_._3).distinct.size.toLong,
          BigDecimal(ps.map(_._4).max)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(r => (r._1, r._2))
    val got = LlmOps.q166SemanticLeakage(spark, d)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    got.foreach { r =>
      assert(r._5 <= r._3, "leaked eval vectors bounded by audited count")
      assert(r._6 <= 1.0001 && r._6 >= -1.0001)
    }
    assert(got.exists(_._5 > 0), "fixture must surface at least one leak")
  }
}
