package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q255 incremental semantic dedup, q256 covariance audit: brute-force
  * Scala replays from the collected sf0.001 embeddings pin the frozen
  * cell assignment, the union-occupancy guard, both pair classes, and
  * the exact quantized co-moment arithmetic (sign-factored truncating
  * division included).
  */
class IncrSemDedupCovSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def vecs: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq

  private def cosRaw(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round4(x: Double): Double =
    BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("q255 equals a from-scratch frozen-seed replay; old-old pairs " +
    "never appear; rerun (index reuse path) is identical") {
    val vs = vecs
    // frozen seeds: the stride rule restricted to BASE vec_ids
    val seeds = vs.filter(v => v._1 % 64L == 0L && v._1 % 10L < 8L)
    assert(seeds.size > 1, "fixture must freeze multiple cells")
    // argmax on the 2^40-quantized cosine (the ArgmaxGrid rule)
    def cellOf(e: Array[Double]): Long =
      seeds.maxBy { case (cid, ce) => (qGrid(cosRaw(e, ce)), cid) }._1
    val assigned = vs.map(v => (v._1, cellOf(v._2), v._2))
    val live = assigned.groupBy(_._2).filter(_._2.size <= 10000).keySet
    val m = assigned.filter(a => live.contains(a._2))
    val expected = (for {
      a <- m; b <- m
      if a._2 == b._2 && a._1 < b._1
      if a._1 % 10 >= 8 || b._1 % 10 >= 8
      sim = cosRaw(a._3, b._3)
      if sim >= 0.3
    } yield {
      val kind = if (a._1 % 10 >= 8 && b._1 % 10 >= 8) "new_new"
        else "new_old"
      (a._1, b._1, kind, a._2, round4(sim))
    }).sortBy(p => (p._1, p._2))
    val got = LlmOps.q255IncrSemDedup(spark, d)
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "tau=0.3 should find semantic pairs")
    // the probe by construction never emits a base-base pair
    assert(got.forall(p => p._1 % 10 >= 8 || p._2 % 10 >= 8))
    // second invocation rides the published layout — identical output
    val again = LlmOps.q255IncrSemDedup(spark, d)
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("q256 equals an exact quantized co-moment replay; diagonal " +
    "covariance non-negative; full upper triangle present") {
    val vs = vecs
    val q = vs.map { case (_, e) =>
      e.map(x => BigDecimal.valueOf(x * 1048576.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val dim = q.head.length
    val n = q.size.toLong
    val expected = (for {
      i <- 0 until dim; j <- i until dim
    } yield {
      val si = q.map(v => BigInt(v(i))).sum
      val sj = q.map(v => BigInt(v(j))).sum
      val sqq = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val num = BigInt(n) * sqq - si * sj
      val den = BigInt(n) * BigInt(n)
      val cov = if (num >= 0) num / den else -((-num) / den)
      (i + 1L, j + 1L, n, si.toLong, sj.toLong, cov.toLong)
    }).sortBy(r => (r._1, r._2))
    val got = LlmOps.q256CovAudit(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.size == dim * (dim + 1) / 2)
    assert(got.filter(r => r._1 == r._2).forall(_._6 >= 0L),
      "a variance numerator can never be negative")
  }

  test("q259 equals a BigInt power-iteration replay from the covariance " +
    "replay; normalization invariant holds") {
    val vs = vecs
    val q = vs.map { case (_, e) =>
      e.map(x => BigDecimal.valueOf(x * 1048576.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val dim = q.head.length
    val n = BigInt(q.size)
    val c = Array.fill(dim + 1, dim + 1)(BigInt(0))
    for (i <- 1 to dim; j <- i to dim) {
      val si = q.map(v => BigInt(v(i - 1))).sum
      val sj = q.map(v => BigInt(v(j - 1))).sum
      val sqq = q.map(v => BigInt(v(i - 1)) * BigInt(v(j - 1))).sum
      val num = n * sqq - si * sj
      val cov = if (num >= 0) num / (n * n) else -((-num) / (n * n))
      c(i)(j) = cov; c(j)(i) = cov
    }
    val U = BigInt(1000000)
    var v = Array.fill(dim + 1)(U); v(0) = BigInt(0)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim + 1)(i =>
        if (i == 0) BigInt(0)
        else (1 to dim).map(j => c(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x => if (mx == 0) BigInt(0)
        else if (x >= 0) x * U / mx else -((-x) * U / mx))
    }
    val expected = (1 to dim).map(i => (i.toLong, v(i).toLong))
    val got = LlmOps.q259PowerIteration(spark, d)
      .orderBy("pos").as[(Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(r => math.abs(r._2)).max == 1000000L,
      "the renormalization pins max |loading| at exactly one unit")
  }

  test("q260 equals a BigInt corr²-ppm replay over the covariance replay; " +
    "ranking bounded by Cauchy-Schwarz at the integer grid") {
    val vs = vecs
    val q = vs.map { case (_, e) =>
      e.map(x => BigDecimal.valueOf(x * 1048576.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val dim = q.head.length
    val n = BigInt(q.size)
    def cov(i: Int, j: Int): BigInt = {
      val si = q.map(v => BigInt(v(i))).sum
      val sj = q.map(v => BigInt(v(j))).sum
      val sqq = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val num = n * sqq - si * sj
      if (num >= 0) num / (n * n) else -((-num) / (n * n))
    }
    val diag = (0 until dim).map(i => cov(i, i))
    val all = (for {
      i <- 0 until dim; j <- (i + 1) until dim
      if diag(i) > 0 && diag(j) > 0
      cij = cov(i, j)
    } yield (i + 1L, j + 1L, cij.toLong,
      (cij * cij * 1000000 / (diag(i) * diag(j))).toLong))
    val expected = all
      .sortBy(r => (-r._4, r._1, r._2)).take(20)
    val got = LlmOps.q260RedundantDims(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.size == 20)
    // corr² can only exceed 1 (1e6 ppm) by grid truncation, never far:
    // the exact covariance would be Cauchy-Schwarz-bounded
    assert(got.forall(_._4 <= 1010000L))
  }
}
