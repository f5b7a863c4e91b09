package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q150 RRF fusion, q151 integer PageRank: full Scala replays from the
  * collected sf0.001 embeddings — kNN edges, quantize round-trip, both
  * rank windows, the scaled-integer RRF arithmetic, and the fixed-point
  * PageRank trajectory including its truncation-leak mass bound.
  */
class RrfPagerankSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def vecs: Seq[(Long, Long, Array[Double])] =
    Tables.embeddings(spark, d)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Array[Double])].collect().toSeq

  // mirrors the CosineSimilarity kernel's sequential accumulation and
  // Spark's round(_, 4)
  private def cos4(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def halfUp(x: Double): Double = {
    val f = math.floor(x); if (x - f >= 0.5) f + 1.0 else f
  }

  // mirrors Quantize.roundTripArray on null-free double arrays
  private def roundTrip(v: Array[Double]): Array[Double] = {
    val vmin = v.min; val vmax = v.max
    if (vmax == vmin) v.map(_ => vmin)
    else { val scale = (vmax - vmin) / 255.0
      v.map(x => vmin + halfUp((x - vmin) / scale) * scale) }
  }

  private def cosRaw(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // mirrors LlmOps.knnEdges: per (label × stride-256 argmax cell),
  // top-5 by (sim DESC, ib), symmetrized; argmax on the 2^40-quantized
  // cosine, ties to the larger cell_id (the engine's max_by on the
  // (qsim, cell_id) struct)
  private def knnEdges(vs: Seq[(Long, Long, Array[Double])])
      : Set[(Long, Long, Long)] = {
    val seeds = vs.filter(_._1 % 256L == 0L).map(v => v._1 -> v._3)
    def cellOf(e: Array[Double]): Long =
      seeds.maxBy { case (cid, ce) => (qGrid(cosRaw(e, ce)), cid) }._1
    vs.groupBy(v => (v._2, cellOf(v._3))).toSeq
      .filter(_._2.size <= 10000)
      .flatMap { case ((label, _), cell) =>
        cell.flatMap { case (ia, _, ea) =>
          cell.filter(_._1 != ia)
            .map { case (ib, _, eb) => (ib, cos4(ea, eb)) }
            .sortBy { case (ib, sim) => (-sim, ib) }
            .take(5)
            .map { case (ib, _) =>
              (label, math.min(ia, ib), math.max(ia, ib)) }
        }
      }.toSet
  }

  test("q150 RRF equals a rank replay; fused integer scores exact") {
    val vs = vecs
    val queries = vs.filter(_._1 < 8)
    val corpus = vs.filter(_._1 >= 8)
    val expected = queries.sortBy(_._1).flatMap { case (qid, ql, qe) =>
      val cands = corpus.filter(_._2 == ql)
      val qr = roundTrip(qe)
      val scored = cands.map { case (vid, _, ve) =>
        (vid, cos4(ve, qe), cos4(roundTrip(ve), qr))
      }
      def ranks(key: ((Long, Double, Double)) => Double): Map[Long, Long] =
        scored.sortBy(s => (-key(s), s._1)).zipWithIndex
          .map { case (s, i) => s._1 -> (i + 1L) }.toMap
      val rc = ranks(_._2); val rq = ranks(_._3)
      scored.map { case (vid, _, _) =>
        val ppb = 1000000000L / (60 + rc(vid)) + 1000000000L / (60 + rq(vid))
        (vid, ppb, rc(vid), rq(vid))
      }.sortBy(s => (-s._2, s._1)).take(5).zipWithIndex.map {
        case ((vid, ppb, a, b), i) => (qid, i + 1L, vid, ppb, a, b)
      }
    }
    val got = LlmOps.q150RrfFusion(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // fusion only ever helps a doc that ranks under BOTH rankers:
    // top-fused must beat every doc on the sum of reciprocal ranks
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("q151 PageRank equals an integer fixed-point replay; mass conserved " +
    "up to the truncation leak") {
    val U = 1000000000000L
    val vs = vecs
    val edges = knnEdges(vs)
    val expected = edges.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (label, es) =>
        val dir = es.toSeq.flatMap(e => Seq((e._2, e._3), (e._3, e._2)))
        val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val n = deg.size.toLong
        var r: Map[Long, Long] = deg.map { case (v, _) => v -> U / n }
        (1 to 3).foreach { _ =>
          val inflow = dir.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
            85 * r(s) / (100 * deg(s))
          }.sum).toMap
          r = deg.map { case (v, _) =>
            v -> (15 * U / (100 * n) + inflow.getOrElse(v, 0L))
          }
        }
        val mass = r.values.sum
        // each of the 3 rounds truncates ≤ 1 unit per directed edge plus
        // ≤ 1 per node of teleport; the uniform start truncates ≤ n
        val leak = 3L * (dir.size + n) + n
        assert(mass <= U && mass >= U - leak, s"label $label mass $mass")
        r.toSeq.sortBy { case (v, pr) => (-pr, v) }.take(3).zipWithIndex
          .map { case ((v, pr), i) =>
            (label, i + 1L, v, pr, n, mass)
          }
    }
    val got = LlmOps.q151Pagerank(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
