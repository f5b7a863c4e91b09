package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q141 OLS trend, q142 DOW profile, q143 CUSUM: BigInt Scala replays pin
  * the exact-integer moment algebra (centered-x slope, truncate-toward-
  * zero signed division), the engine-neutral weekday arithmetic, and the
  * scaled-deviation CUSUM with earliest-day tie-break.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def rows: Seq[(String, Long, Long, String)] =
    Tables.events(spark, d)
      .select($"event_type", expr("unix_micros(ts)").as("us"),
        round($"value" * 100, 0).cast("long").as("cents"),
        to_date($"ts").cast("string").as("day"))
      .as[(String, Long, Long, String)].collect().toSeq

  test("q141 slope equals a BigInt moment replay (sign-factored division)") {
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val minUs = rs.map(_._2).min
      val xy = rs.map(r => (BigInt((r._2 - minUs) / 1000000L), BigInt(r._3)))
      val n = BigInt(xy.size)
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val slope = if (den > 0)
        Some((num.signum * ((num.abs * 86400000) / den)).toLong) else None
      (et, xy.size.toLong, xy.map(_._1).max.toLong, (sy * 1000 / n).toLong,
        slope)
    }
    val got = Warehouse.q141Trend(spark, d)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    assert(got.forall(_._5.isDefined), "fixture spans > 1 second per type")
  }

  test("q142 DOW profile equals an epoch-day replay; one peak per type") {
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (et, rs) =>
      val byDow = rs.groupBy { r =>
        (java.time.LocalDate.parse(r._4, fmt).toEpochDay + 4) % 7
      }
      val nType = rs.size.toLong
      val cells = byDow.toSeq.map { case (dow, v) =>
        val tot = v.map(_._3).sum
        (dow, v.size.toLong, tot * 1000 / v.size)
      }
      val peak = cells.maxBy(c => (c._3, c._1))
      cells.sortBy(_._1).map { case (dow, n, mean) =>
        (et, dow, n, n * 1000000L / nType, mean,
          (mean, dow) == ((peak._3, peak._1)))
      }
    }
    val got = Warehouse.q142DowProfile(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
    assert(got.count(_._6) == got.map(_._1).distinct.size,
      "exactly one peak day per type")
  }

  test("q143 CUSUM equals a scaled-deviation replay with earliest-day ties") {
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val daily = rs.groupBy(_._4).toSeq
        .map { case (day, v) => (day, BigInt(v.map(_._3).sum)) }
        .sortBy(_._1)
      val n = BigInt(daily.size); val g = daily.map(_._2).sum
      val cusums = daily.scanLeft(BigInt(0)) { case (s, (_, t)) =>
        s + t * n - g
      }.tail.map(_.abs)
      val (best, idx) = cusums.zipWithIndex.maxBy { case (c, i) => (c, -i) }
      (et, daily.size.toLong, daily(idx)._1,
        (best * 1000000 / (g * n)).toLong)
    }
    val got = Warehouse.q143Cusum(spark, d)
      .select($"event_type", $"n_days", $"change_day".cast("string"),
        $"severity_ppm")
      .as[(String, Long, String, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 0), "fixture should show some level shift")
  }

  test("q156 streaks equal a literal consecutive-day replay with " +
    "smallest-user champion ties") {
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val dayRows = Tables.events(spark, d)
      .select($"event_type", $"user_id", to_date($"ts").cast("string"))
      .distinct()
      .as[(String, Long, String)].collect().toSeq
    val expected = dayRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (et, rs) =>
        val perUser = rs.groupBy(_._2).toSeq.map { case (u, ds) =>
          val days = ds.map(r =>
            java.time.LocalDate.parse(r._3, fmt).toEpochDay)
          // literal scan: longest run of consecutive epoch days
          val sorted = days.sorted
          var best = 1L; var cur = 1L
          (1 until sorted.size).foreach { k =>
            cur = if (sorted(k) == sorted(k - 1) + 1) cur + 1 else 1L
            if (cur > best) best = cur
          }
          (u, best)
        }
        val champion = perUser.minBy { case (u, b) => (-b, u) }
        (et, perUser.size.toLong, perUser.map(_._2).max, champion._1,
          perUser.count(_._2 >= 7).toLong,
          perUser.map(_._2).sum * 1000 / perUser.size)
    }
    val got = Warehouse.q156Streaks(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._3 >= 2), "fixture should contain real streaks")
  }

  test("q157 seasonality strength equals a BigInt ANOVA replay; eta2 in " +
    "[0, 1e6]") {
    val rows = Tables.events(spark, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100, 0).cast("long")).as("x"))
      .select($"event_type", $"day".cast("string"), $"x")
      .as[(String, String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val cells = rs.map { r =>
        ((java.time.LocalDate.parse(r._2).toEpochDay + 4) % 7, BigInt(r._3))
      }
      val n = BigInt(cells.size)
      val g = cells.map(_._2).sum
      val sxx = cells.map(c => c._2 * c._2).sum
      val byDow = cells.groupBy(_._1).values.toSeq
      val stg = byDow.map { grp =>
        val gg = grp.map(_._2).sum
        gg * gg * n / grp.size // BigInt division floors on positives
      }.sum
      val num = (stg - g * g).max(BigInt(0))
      val den = n * sxx - g * g
      val eta = if (den > 0) Some((num * 1000000 / den).toLong) else None
      (et, cells.size.toLong, byDow.size.toLong, eta)
    }
    val got = Warehouse.q157SeasonStrength(spark, d)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    got.flatMap(_._4).foreach(e => assert(e >= 0 && e <= 1000000))
    assert(got.forall(_._3 == 7), "fixture spans all weekdays")
  }

  test("q165 chi-square mix equals a BigInt contingency replay; margins " +
    "reconcile") {
    val rows = Tables.events(spark, d)
      .select($"event_type", to_date($"ts").cast("string"))
      .as[(String, String)].collect().toSeq
      .map { case (et, day) =>
        (et, (java.time.LocalDate.parse(day).toEpochDay + 4) % 7)
      }
    val types = rows.map(_._1).distinct.sorted
    val obs = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = BigInt(rows.size)
    val expected = (for (et <- types; dow <- 0L to 6L) yield {
      val o = obs.getOrElse((et, dow), 0L)
      val r = BigInt((0L to 6L).map(w => obs.getOrElse((et, w), 0L)).sum)
      val c = BigInt(types.map(t => obs.getOrElse((t, dow), 0L)).sum)
      val e = (r * c / n).toLong
      val dev = o - e
      val contrib = (BigInt(dev) * dev * 1000 / BigInt(e).max(1)).toLong
      (et, dow, o, e, dev, contrib)
    }).toSeq
    val chi2ByType = expected.groupBy(_._1).view
      .mapValues(_.map(_._6).sum).toMap
    val got = Warehouse.q165Chi2Mix(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) == expected)
    got.foreach(r => assert(r._7 == chi2ByType(r._1)))
    // margins: per-type deviations sum to within the per-cell floor leak
    // (|dows| floors of E), and observed totals reconcile exactly
    assert(got.map(_._3).sum == rows.size.toLong)
    got.groupBy(_._1).values.foreach { cells =>
      val devSum = cells.map(_._5).sum
      assert(devSum >= 0 && devSum < 7, "E-floor leak bound per type")
    }
  }

  test("q168 DOW anomalies equal a literal median/MAD replay with " +
    "earliest-worst-day ties") {
    val daily = Tables.events(spark, d)
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"))
      .agg(sum(round($"value" * 100, 0).cast("long")).as("x"))
      .as[(String, String, Long)].collect().toSeq
    def med(vs: Seq[Long]): Long = vs.sorted.apply(((vs.size + 1) / 2 - 1))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, ds) =>
      val scored = ds.groupBy(r =>
        (java.time.LocalDate.parse(r._2).toEpochDay + 4) % 7)
        .values.flatMap { cell =>
          val m = med(cell.map(_._3))
          val devs = cell.map(r => (r._2, (r._3 - m).abs))
          val mad = med(devs.map(_._2)).max(1L)
          devs.map { case (day, dv) => (day, dv * 1000 / mad) }
        }.toSeq
      val wr = scored.map(_._2).max
      (et, ds.size.toLong, scored.count(_._2 > 3000).toLong,
        scored.filter(_._2 == wr).map(_._1).min, wr)
    }
    val got = Warehouse.q168DowAnomaly(spark, d)
      .select($"event_type", $"n_days", $"n_anomalies",
        $"worst_day".cast("string"), $"worst_ratio_milli")
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(got == expected)
    // median/MAD guarantee: at most half a cell can sit beyond 1 MAD,
    // so anomalies (>3 MAD) are always a minority of scored days
    got.foreach(r => assert(r._3 * 2 <= r._2))
  }

  test("q171 seasonal backtest equals a literal calendar-lag replay") {
    val daily = Tables.events(spark, d)
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"))
      .agg(sum(round($"value" * 100, 0).cast("long")).as("x"))
      .as[(String, String, Long)].collect().toSeq
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, ds) =>
      val at = ds.map(r =>
        java.time.LocalDate.parse(r._2).toEpochDay -> r._3).toMap
      def sae(lagDays: Long): (Long, Long) = {
        val pairs = at.toSeq.flatMap { case (ed, x) =>
          at.get(ed - lagDays).map(xl => (x - xl).abs)
        }
        (pairs.size.toLong, pairs.sum)
      }
      val (n7, s7) = sae(7); val (n1, s1) = sae(1)
      val mase = if (s1 > 0 && n7 > 0)
        Some((BigInt(s7) * n1 * 1000 / (BigInt(s1) * n7)).toLong)
      else None
      (et, ds.size.toLong, n7, n1, s7, s1, mase)
    }
    val got = Warehouse.q171SeasonalBacktest(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == expected)
    // a calendar gap can only REMOVE error pairs, never fabricate them
    got.foreach(r => assert(r._3 <= r._2 && r._4 <= r._2))
  }
}
