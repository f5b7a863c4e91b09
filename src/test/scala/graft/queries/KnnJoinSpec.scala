package graft.queries

import graft.{SparkSpec, Tables}

/** q82 batch k-NN join invariants: exactly k ranked neighbors per query,
  * neighbors come from the query's own cell, ranks agree with a
  * brute-force recomputation for one query.
  */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("every query gets exactly k contiguous ranks; no self- or cross-cell neighbors") {
    val rows = LlmOps.q82KnnJoin(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    val cellOf = Tables.embeddings(spark, d)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, ns) =>
      assert(q % 50 == 0, s"$q is not a query id")
      assert(ns.map(_._2).sorted.toSeq == (1L to 3L), s"query $q ranks not 1..3")
      ns.foreach { case (_, _, n, sim) =>
        assert(n % 50 != 0, s"neighbor $n is a query, not corpus")
        assert(cellOf(n) == cellOf(q), s"neighbor $n crossed cells for query $q")
        assert(sim <= 1.0001 && sim >= -1.0001)
      }
      // ranks ordered by descending similarity
      val sims = ns.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $q: similarities not descending by rank")
    }
  }

  test("one query's neighbors match a brute-force scan of its cell") {
    val e = Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val q = e.filter(_._1 % 50 == 0).minBy(_._1)
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val (xd, yd) = (x.map(_.toDouble), y.map(_.toDouble))
      xd.zip(yd).map { case (a, b) => a * b }.sum /
        (math.sqrt(xd.map(v => v * v).sum) * math.sqrt(yd.map(v => v * v).sum))
    }
    val want = e.filter(r => r._1 % 50 != 0 && r._2 == q._2)
      .map(r => (r._1, BigDecimal(cos(r._3, q._3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, sim) => (-sim, id) }.take(3)
      .zipWithIndex.map { case ((id, sim), i) => (i + 1L, id, sim) }.toList
    val got = LlmOps.q82KnnJoin(spark, d)
      .filter(org.apache.spark.sql.functions.col("q_id") === q._1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._2, r._3, r._4)).toList
    assert(got == want, s"got $got, want $want")
  }
}
