package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q144 Spearman, q145 Gini, q146 autocorrelation: BigInt Scala replays
  * pin the tie-aware average-rank algebra (against a literal
  * sort-and-average-ranks computation), the histogram Gini identity
  * (against a brute-force ranked Gini plus an exact top-decile split),
  * and the n²-scaled lag-1 moment expansion (against the textbook
  * fractional-mean estimator).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  // Literal average ranks (1-based, ties averaged), doubled to integers.
  private def avgRank2(xs: Seq[Long]): Map[Long, BigInt] = {
    val sorted = xs.sorted
    xs.distinct.map { v =>
      val before = sorted.count(_ < v); val c = sorted.count(_ == v)
      // avg of ranks before+1 .. before+c, doubled: 2*before + c + 1
      v -> BigInt(2L * before + c + 1)
    }.toMap
  }

  test("q144 Spearman equals Pearson over literal tie-averaged ranks") {
    val rows = Tables.lineitem(spark, d)
      .select($"l_returnflag", $"l_quantity".cast("long"),
        round($"l_discount" * 100, 0).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val rx = avgRank2(rs.map(_._2)); val ry = avgRank2(rs.map(_._3))
      val n = BigInt(rs.size)
      val dxy = rs.map(r => (rx(r._2) - (n + 1), ry(r._3) - (n + 1)))
      val sxy = dxy.map(p => p._1 * p._2).sum
      val sxx = dxy.map(p => p._1 * p._1).sum
      val syy = dxy.map(p => p._2 * p._2).sum
      assert(dxy.map(_._1).sum == 0 && dxy.map(_._2).sum == 0,
        "centered double-ranks must sum to zero")
      val rho = BigDecimal(sxy) /
        (BigDecimal(math.sqrt(sxx.toDouble)) *
          BigDecimal(math.sqrt(syy.toDouble)))
      (g, rs.size.toLong, rs.map(_._2).distinct.size.toLong,
        rs.map(_._3).distinct.size.toLong,
        rho.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Stats.q144Spearman(spark, d)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4)
      assert(math.abs(g._5 - e._5) <= 1e-6, s"rho mismatch: $g vs $e")
    }
    assert(got.size == expected.size && got.nonEmpty)
  }

  test("q145 Gini equals a brute-force ranked computation with exact top-decile") {
    val rows = Tables.events(spark, d)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("v"))
      .select($"event_type", $"v".cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val xs = rs.map(_._2).sorted
      val n = BigInt(xs.size); val t = xs.map(BigInt(_)).sum
      val s = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (2 * s - (n + 1) * t) * 1000000 / (n * t)
      val k = (n / 10).toInt
      val topk = xs.sortBy(-_).take(k).map(BigInt(_)).sum
      (et, xs.size.toLong, t.toLong, gini.toLong,
        (topk * 1000000 / t).toLong)
    }
    val got = Stats.q145Gini(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 0), "fixture should show some concentration")
  }

  test("q146 lag-1 autocorrelation equals the fractional-mean estimator") {
    val rows = Tables.events(spark, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100, 0).cast("long")).as("x"))
      .select($"event_type", $"day".cast("string"), $"x")
      .as[(String, String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val xs = rs.sortBy(_._2).map(r => BigInt(r._3))
      val n = BigInt(xs.size)
      val g = xs.sum
      val pairs = xs.zip(xs.tail) // (x_{t-1}, x_t)
      // textbook: sum((x_t - mean)(x_{t-1} - mean)) / sum((x - mean)^2),
      // multiplied through by n^2 to stay rational-exact
      val num = n * n * pairs.map(p => p._1 * p._2).sum -
        n * g * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
        (n - 1) * g * g
      val den = n * n * xs.map(x => x * x).sum - n * g * g
      val r1 =
        if (n >= 2 && den > 0)
          Some((BigInt(num.signum) * (num.abs * 1000000 / den)).toLong)
        else None
      (et, xs.size.toLong, r1)
    }
    val got = Stats.q146Autocorr(spark, d)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    assert(got.forall(_._3.isDefined), "fixture has >= 2 days per type")
  }

  test("q147 Benford emits all 9 digits per group; shares sum to ~1e6; " +
    "constants are round(log10(1+1/d)*1e6)") {
    Stats.BenfordPpm.foreach { case (dg, p) =>
      assert(p == math.round(math.log10(1.0 + 1.0 / dg) * 1000000),
        s"constant for digit $dg")
    }
    assert(Stats.BenfordPpm.map(_._2).sum == 1000000L)
    val got = Stats.q147Benford(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val byG = got.groupBy(_._1)
    byG.foreach { case (g, rows) =>
      assert(rows.map(_._2).sorted == (1L to 9L), s"digit spine for $g")
      val obs = rows.map(_._4).sum
      // floor-division shortfall < 9 ppm across 9 digits
      assert(obs > 1000000L - 9 && obs <= 1000000L, s"obs sum $obs for $g")
      rows.foreach(r => assert(r._6 == r._4 - r._5, "dev = obs - exp"))
    }
    // replay one group's digit counts literally
    val raw = Tables.orders(spark, d)
      .select($"o_orderpriority",
        round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      .as[(String, Long)].collect().toSeq
    val g0 = raw.map(_._1).min
    val exp0 = raw.filter(_._1 == g0)
      .groupBy(r => r._2.toString.head.asDigit.toLong)
      .view.mapValues(_.size.toLong).toMap
    got.filter(_._1 == g0).foreach { r =>
      assert(r._3 == exp0.getOrElse(r._2, 0L), s"digit ${r._2} count")
    }
  }

  test("q149 KS statistic equals a BigInt CDF-gap replay with smallest-cents ties") {
    val rows = Tables.events(spark, d)
      .select($"event_type", round($"value" * 100, 0).cast("long"),
        ($"user_id" % 2 === 0))
      .as[(String, Long, Boolean)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val na = BigInt(rs.count(_._3)); val nb = BigInt(rs.size - rs.count(_._3))
      val values = rs.map(_._2).distinct.sorted
      var cuma = BigInt(0); var cumb = BigInt(0)
      var best = BigInt(-1); var bestV = 0L
      values.foreach { v =>
        cuma += rs.count(r => r._2 == v && r._3)
        cumb += rs.count(r => r._2 == v && !r._3)
        val gap = (cuma * nb - cumb * na).abs
        if (gap > best) { best = gap; bestV = v }
      }
      (et, na.toLong, nb.toLong, (best * 1000000 / (na * nb)).toLong, bestV)
    }
    val got = Stats.q149KsDrift(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000))
  }

  test("q152 peak concurrency equals a literal sweep replay; half-open " +
    "intervals (end == start does not overlap)") {
    val iv = 600L * 1000000L
    val rows = Tables.events(spark, d)
      .select($"event_type", to_date($"ts").cast("string"),
        expr("unix_micros(ts)"))
      .as[(String, String, Long)].collect().toSeq
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((et, day), rs) =>
        val dayEnd = (java.time.LocalDate.parse(day).toEpochDay + 1) *
          86400L * 1000000L
        val bounds = rs.flatMap { r =>
          Seq((r._3, 1L), (math.min(r._3 + iv, dayEnd), -1L))
        }.sortBy(identity)
        val sweep = bounds.scanLeft((0L, 0L)) { case ((live, _), (t, dl)) =>
          (live + dl, t)
        }.tail
        val peak = sweep.map(_._1).max
        val firstPeak = sweep.filter(_._1 == peak).map(_._2).min
        (et, day, rs.size.toLong, peak, firstPeak)
      }
    val got = Warehouse.q152PeakConcurrency(spark, d)
      .select($"event_type", $"day".cast("string"), $"n_events", $"peak",
        $"first_peak_us")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 1), "fixture should show real overlap")
    // synthetic half-open check: [0,10) and [10,20) never coexist
    val b = Seq((0L, 1L), (10L, -1L), (10L, 1L), (20L, -1L)).sorted
    assert(b.scanLeft(0L)(_ + _._2).max == 1L)
  }

  test("q153 trimmed/winsorized means equal a literal sort-and-trim replay") {
    val rows = Tables.events(spark, d)
      .select($"event_type", round($"value" * 100, 0).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.size; val k = n / 20
      val kept = xs.slice(k, n - k)
      val winso = Seq.fill(k)(kept.head) ++ kept ++ Seq.fill(k)(kept.last)
      (et, n.toLong, k.toLong, kept.head, kept.last,
        kept.map(BigInt(_)).sum * 1000 / kept.size,
        winso.map(BigInt(_)).sum * 1000 / n,
        xs.map(BigInt(_)).sum * 1000 / n)
    }.map(t => (t._1, t._2, t._3, t._4, t._5, t._6.toLong, t._7.toLong,
      t._8.toLong))
    val got = Stats.q153TrimmedMean(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == expected)
    // both robust means lie within the surviving value range
    got.foreach { r =>
      assert(r._4 * 1000 <= r._6 && r._6 <= r._5 * 1000, "trimmed in range")
      assert(r._4 * 1000 <= r._7 && r._7 <= r._5 * 1000, "winsorized in range")
    }
  }

  test("q154 Q-Q deciles equal literal type-1 quantiles of each parity slice") {
    val rows = Tables.events(spark, d)
      .select($"event_type", round($"value" * 100, 0).cast("long"),
        ($"user_id" % 2 === 0))
      .as[(String, Long, Boolean)].collect().toSeq
    def q1(xs: Seq[Long], p: Long): Long = {
      val sorted = xs.sorted
      sorted(((p * xs.size + 99) / 100 - 1).toInt) // rank is 1-based
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (et, rs) =>
        val a = rs.filter(_._3).map(_._2); val b = rs.filterNot(_._3).map(_._2)
        (10L to 90L by 10L).map { p =>
          val qa = q1(a, p); val qb = q1(b, p)
          (et, p, qa, qb, qb - qa)
        }
    }
    val got = Stats.q154QqTable(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // deciles are monotone in p within each (type, side)
    got.groupBy(_._1).values.foreach { rsRaw =>
      val rs = rsRaw.sortBy(_._2)
      assert(rs.map(_._3) == rs.map(_._3).sorted, "side A monotone")
      assert(rs.map(_._4) == rs.map(_._4).sorted, "side B monotone")
    }
  }

  test("q155 decile lift equals a literal ranked split; shares telescope " +
    "and decay down the deciles") {
    val rows = Tables.events(spark, d)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("v"))
      .select($"event_type", $"v".cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (et, rs) =>
        val xs = rs.map(_._2).sortBy(-_) // most active first
        val n = xs.size.toLong; val t = xs.sum
        var cum = 0L
        (1L to 10L).map { dec =>
          val lo = ((dec - 1) * n / 10).toInt; val hi = (dec * n / 10).toInt
          val ev = xs.slice(lo, hi).sum
          cum += ev
          (et, dec, (hi - lo).toLong, ev, ev * 1000000L / t,
            cum * 1000000L / t)
        }
    }
    val got = Stats.q155DecileLift(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    got.groupBy(_._1).values.foreach { rsRaw =>
      val rs = rsRaw.sortBy(_._2)
      assert(rs.map(_._4).sum == rows.filter(_._1 == rs.head._1).map(_._2).sum,
        "decile events telescope to the total")
      // per-user intensity is non-increasing down the deciles (where
      // deciles are non-empty)
      val intens = rs.filter(_._3 > 0).map(r => BigDecimal(r._4) / r._3)
      assert(intens == intens.sorted.reverse, "intensity decays")
    }
  }

  test("q159 tail trend equals a literal per-day p90 + BigInt OLS replay") {
    val rows = Tables.events(spark, d)
      .select($"event_type", to_date($"ts").cast("string"),
        round($"value" * 100, 0).cast("long"))
      .as[(String, String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val daily = rs.groupBy(_._2).toSeq.map { case (day, v) =>
        val xs = v.map(_._3).sorted
        val rank = (9 * xs.size + 9) / 10 // ceil(0.9 n), 1-based
        (java.time.LocalDate.parse(day).toEpochDay, BigInt(xs(rank - 1)))
      }
      val minDay = daily.map(_._1).min
      val xy = daily.map { case (ed, p) => (BigInt(ed - minDay), p) }
      val n = BigInt(xy.size)
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val slope = if (den > 0)
        Some((num.signum * (num.abs * 1000 / den)).toLong) else None
      (et, xy.size.toLong, xy.map(_._2).min.toLong, xy.map(_._2).max.toLong,
        (sy * 1000 / n).toLong, slope)
    }
    val got = Stats.q159TailTrend(spark, d)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    assert(got.forall(_._6.isDefined), "fixture spans multiple days per type")
  }

  test("q227 gap fill: exact lerp on the dropout grid, interior-only") {
    val rows = Stats.q227GapFill(spark, d)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, rs) =>
      val days = rs.map(_._2)
      // dense interior grid: every day between first and last observed
      assert(days == (days.min to days.max),
        "gap fill must produce a dense, ordered grid")
      // observed days follow the dropout pattern; the rest are interp
      rs.foreach { case (_, day, _, src) =>
        assert((src == "obs") == (day % 5 < 3), s"day $day tagged $src")
      }
      // exact integer lerp between the surrounding observations
      val obs = rs.filter(_._4 == "obs").map(r => r._2 -> r._3).toMap
      rs.filter(_._4 == "interp").foreach { case (_, dd, v, _) =>
        val p = (dd - 1 to dd - 2 by -1).find(obs.contains).get
        val n = (dd + 1 to dd + 2).find(obs.contains).get
        val want = (BigInt(obs(p)) * (n - dd) + BigInt(obs(n)) * (dd - p)) /
          BigInt(n - p)
        assert(BigInt(v) == want, s"lerp at $dd")
      }
    }
    // the fixture actually exercises interpolation
    assert(rows.count(_._4 == "interp") > 0)
  }
}
