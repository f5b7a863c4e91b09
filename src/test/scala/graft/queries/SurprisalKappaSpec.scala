package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.PolyHash

/** Independent-recomputation coverage for q121 (unigram surprisal
  * banding) and q122 (rule-vs-classifier Cohen's kappa): both queries
  * are replayed in plain Scala from the raw fixture and the same
  * published constants, then compared cell-exactly.
  */
class SurprisalKappaSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def fixtureDocs: Seq[(Long, String, String, String)] =
    Tables.documents(spark, d)
      .select("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)].collect().toSeq

  test("q121 matches an independent Scala replay of the banding") {
    val docs = fixtureDocs
    val tokensOf = (t: String) => t.trim.toLowerCase.split("\\s+").toSeq
    val counts = docs.flatMap(r => tokensOf(r._4))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val fb = counts.map { case (w, c) =>
      w -> (64L - java.lang.Long.numberOfLeadingZeros(c))
    }
    val perDoc = docs.map { r =>
      val ts = tokensOf(r._4)
      val sumFb = ts.map(fb).sum
      val n = ts.size.toLong
      (n, sumFb * 1000L / n)
    }
    val totalDocs = perDoc.size.toLong
    val expected = perDoc.groupBy(_._2 / 1000).toSeq.map {
      case (band, rows) =>
        (band, rows.size.toLong, rows.map(_._1).sum,
          rows.map(_._2).min, rows.map(_._2).max,
          rows.size.toLong * 1000000L / totalDocs)
    }.sortBy(_._1)
    val got = LlmOps.q121Surprisal(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q121 band invariants: milli-means live inside their band") {
    val out = LlmOps.q121Surprisal(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (band, nDocs, nToks, minM, maxM, share) =>
      assert(minM / 1000 == band && maxM / 1000 == band,
        s"band $band must bound its member milli-means")
      assert(minM <= maxM && nDocs >= 1 && nToks >= nDocs)
      assert(share >= 0L && share <= 1000000L)
    }
    assert(out.map(_._2).sum ==
      Tables.documents(spark, d).count())
  }

  private val stopEn = Set("the", "a", "of", "and", "is", "to", "in")

  test("q122 matches an independent Scala replay of the kappa audit") {
    val docs = fixtureDocs
    val cells = docs.groupBy(_._2).toSeq.map { case (lang, rows) =>
      val flags = rows.map { r =>
        val ts = r._4.trim.split("\\s+").toSeq
        val n = ts.size
        val logit = ts.map { tok =>
          val j = PolyHash.horner(tok) % 1024L
          (j * 37L + 11L) % 21L - 10L
        }.sum
        val mwl = r._4.replace(" ", "").length.toDouble / n
        val rk = n >= 30 && mwl >= 3.0 && mwl <= 10.0 &&
          ts.count(stopEn) >= 2
        (rk, logit >= 0L)
      }
      val a = flags.count(f => f._1 && f._2).toLong
      val b = flags.count(f => f._1 && !f._2).toLong
      val c = flags.count(f => !f._1 && f._2).toLong
      val dd = flags.count(f => !f._1 && !f._2).toLong
      val n = a + b + c + dd
      val pe = BigInt(a + b) * BigInt(a + c) + BigInt(c + dd) * BigInt(b + dd)
      val num = BigInt(n) * BigInt(a + dd) - pe
      val den = BigInt(n) * BigInt(n) - pe
      val kappa =
        if (den == 0) None
        else Some((num.signum * (num.abs * 1000000 / den.abs)).toLong)
      (lang, n, a, b, c, dd, (a + dd) * 1000000L / n, kappa)
    }.sortBy(_._1)
    val got = LlmOps.q122SignalKappa(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == cells)
  }

  test("q122 invariants: cells partition the corpus, kappa bounded above") {
    val out = LlmOps.q122SignalKappa(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, n, a, b, c, dd, agree, kappa) =>
      assert(a + b + c + dd == n, s"$lang: confusion cells must sum to n")
      assert(agree >= 0L && agree <= 1000000L)
      kappa.foreach(k => assert(k <= 1000000L, s"$lang: kappa cannot exceed 1"))
    }
    assert(out.map(_._2).sum == Tables.documents(spark, d).count())
  }

  test("q188 length-band Spearman equals a BigInt doubled-rank replay") {
    val d0 = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d0)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq
    val toks = docs.map(r =>
      (r._1, r._3.trim.toLowerCase.split("\\s+").toSeq))
    val fb = toks.flatMap(_._2).groupBy(identity).view
      .mapValues(ws => java.lang.Long.toBinaryString(ws.size.toLong).length.toLong)
      .toMap
    val band = toks.map { case (id, ws) =>
      id -> ws.map(fb).sum * 1000 / ws.size
    }.toMap
    val triples = docs.map(r => (r._2, r._3.length.toLong, band(r._1)))
    val expected = triples.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, rs) =>
        val n = rs.size.toLong
        def r2(vs: Seq[Long]): Map[Long, Long] = {
          val grouped = vs.groupBy(identity).view.mapValues(_.size.toLong)
            .toSeq.sortBy(_._1)
          var cum = 0L
          grouped.map { case (v, cv) =>
            val r = 2 * cum + cv + 1; cum += cv; v -> r
          }.toMap
        }
        val rx = r2(rs.map(_._2)); val ry = r2(rs.map(_._3))
        val dx = rs.map(r0 => BigInt(rx(r0._2)) - (n + 1))
        val dy = rs.map(r0 => BigInt(ry(r0._3)) - (n + 1))
        val sxy = dx.zip(dy).map { case (a, b) => a * b }.sum
        val sxx = dx.map(a => a * a).sum
        val syy = dy.map(a => a * a).sum
        val rho = BigDecimal(
          sxy.toDouble / (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (lang, n, rho)
    }
    val got = LlmOps.q188LenBandSpearman(spark, d0)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 2e-6, s"${g._1}: ${g._3} vs ${e._3}")
      assert(g._3.abs <= 1.0)
    }
  }
}
