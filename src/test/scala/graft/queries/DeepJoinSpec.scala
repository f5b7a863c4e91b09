package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q179 — the six-table Q5-shaped chain: literal replay plus the plan
  * properties the docstring claims (broadcast dims, no nested loop).
  */
class DeepJoinSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q179 local revenue equals a literal six-table replay") {
    val cust = Tables.customer(spark, d)
      .select($"c_custkey", $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val supp = Tables.supplier(spark, d)
      .select($"s_suppkey", $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val nat = Tables.nation(spark, d)
      .select($"n_nationkey".cast("long"), $"n_name", $"n_regionkey".cast("long"))
      .as[(Long, String, Long)].collect()
    val asia = Tables.region(spark, d)
      .select($"r_regionkey".cast("long"), $"r_name")
      .as[(Long, String)].collect().filter(_._2 == "ASIA").map(_._1).toSet
    val nationName = nat.filter(n => asia(n._3)).map(n => n._1 -> n._2).toMap
    val ords = Tables.orders(spark, d)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").cast("string"))
      .as[(Long, Long, String)].collect()
      .filter(_._3.startsWith("1996")).map(o => o._1 -> o._2).toMap
    val rows = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_suppkey",
        round($"l_extendedprice" * 100, 0).cast("long"),
        round($"l_discount" * 100, 0).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expected = rows.flatMap { case (ok, sk, cents, dp) =>
      for {
        ck <- ords.get(ok)
        cn = cust(ck)
        sn = supp(sk) if sn == cn
        name <- nationName.get(cn)
      } yield (name, cents * (100 - dp))
    }.groupBy(_._1).toSeq
      .map { case (n, rs) => (n, rs.size.toLong, rs.map(_._2).sum) }
      .sortBy(r => (-r._3, r._1))
      .zipWithIndex.map { case (r, _) => r }
    val got = Relational.q179LocalRevenue(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must have local-supplier ASIA revenue")
  }

  test("q179 plan: dims broadcast, no nested loop, and the year filter " +
    "prunes before the fact joins") {
    val plan = Relational.q179LocalRevenue(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "no nested loop anywhere")
    assert(plan.contains("year"), "year predicate present as an early filter")
  }

  test("q180 grouping sets equal four independent aggregations and lower " +
    "to ONE Expand pass") {
    val rows = Tables.lineitem(spark, d)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity".cast("long"))
      .as[(String, String, Long)].collect().toSeq
    def agg(key: ((String, String, Long)) => (Option[String], Option[String]))
        : Seq[(Option[String], Option[String], Long, Long)] =
      rows.groupBy(key).toSeq.map { case ((f, st), rs) =>
        (f, st, rs.size.toLong, rs.map(_._3).sum)
      }
    val expected = (
      agg(r => (Some(r._1), None)).map(r => (1L, r._1, r._2, r._3, r._4)) ++
        agg(r => (None, Some(r._2))).map(r => (2L, r._1, r._2, r._3, r._4)) ++
        agg(r => (Some(r._1), Some(r._2)))
          .map(r => (0L, r._1, r._2, r._3, r._4)) ++
        Seq((3L, None: Option[String], None: Option[String],
          rows.size.toLong, rows.map(_._3).sum))
      ).sortBy(r => (r._1, r._2, r._3))
    val df = Relational.q180GroupingSets(spark, d)
    val got = df
      .as[(Long, Option[String], Option[String], Long, Long)].collect().toSeq
    assert(got == expected)
    // one Expand, one aggregate pass — not a union of four scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must lower to Expand")
    assert(!plan.toLowerCase.contains("union"), "never a per-set rescan union")
  }

  test("q181 TWAP equals a literal intra-day holding replay and diverges " +
    "from the plain mean under bursts") {
    val rows = Tables.events(spark, d)
      .select($"event_type", to_date($"ts").cast("string"),
        expr("unix_micros(ts)"), $"event_id",
        round($"value" * 100, 0).cast("long"))
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val segs = rs.groupBy(_._2).values.flatMap { day =>
        val o = day.sortBy(r => (r._3, r._4))
        o.zip(o.tail).map { case (a, b) => (a._5, b._3 - a._3) }
      }.toSeq
      val t = segs.map(s => BigInt(s._2)).sum
      val cw = segs.map(s => BigInt(s._1) * s._2).sum
      val sc = segs.map(s => BigInt(s._1)).sum
      (et, segs.size.toLong, t.toLong,
        if (t > 0) Some((cw * 1000 / t).toLong) else None,
        (sc * 1000 / segs.size).toLong)
    }
    val got = Relational.q181Twap(spark, d)
      .as[(String, Long, Long, Option[Long], Long)].collect().toSeq
    assert(got == expected)
    got.foreach(r => assert(r._2 > 0 && r._3 > 0))
  }

  test("q182 session funnel equals a literal gap-session replay with " +
    "ordered view-before-purchase semantics") {
    val rows = Tables.events(spark, d)
      .select($"user_id", expr("unix_micros(ts)"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val gap = 30L * 60L * 1000000L
    val sessions = rows.groupBy(_._1).values.flatMap { evs =>
      val o = evs.sortBy(e => (e._2, e._3))
      val sid = o.scanLeft((0L, Option.empty[Long])) { case ((id, prev), e) =>
        (if (prev.forall(p => e._2 > p + gap)) id + 1 else id, Some(e._2))
      }.tail.map(_._1)
      o.zip(sid).groupBy(_._2).values.map(_.map(_._1))
    }.toSeq
    def band(n: Int): String =
      if (n == 1) "1" else if (n == 2) "2" else if (n <= 5) "3-5"
      else if (n <= 10) "6-10" else "11+"
    val stats = sessions.map { ses =>
      val fv = ses.filter(_._4 == "view").map(e => (e._2, e._3)).minOption
      val lp = ses.filter(_._4 == "purchase").map(e => (e._2, e._3)).maxOption
      (band(ses.size), fv.isDefined,
        fv.isDefined && lp.isDefined &&
          implicitly[Ordering[(Long, Long)]].lt(fv.get, lp.get))
    }
    val expected = stats.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, ss) =>
      val wv = ss.count(_._2).toLong
      val cv = ss.count(_._3).toLong
      (b, ss.size.toLong, wv, cv, if (wv > 0) Some(cv * 1000000L / wv) else None)
    }
    val got = Relational.q182SessionFunnel(spark, d)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    got.foreach(r => assert(r._4 <= r._3 && r._3 <= r._2))
  }

  test("q183 activation cross-tab equals a literal per-user replay and " +
    "only scores observable users") {
    val rows = Tables.events(spark, d)
      .select($"user_id", to_date($"ts").cast("string"))
      .as[(Long, String)].collect().toSeq
      .map { case (u, day) => (u, java.time.LocalDate.parse(day).toEpochDay) }
    val maxDay = rows.map(_._2).max
    val perUser = rows.groupBy(_._1).toSeq
      .map { case (u, ds) => (u, ds.map(_._2).min, ds.map(_._2)) }
      .filter(_._2 <= maxDay - 27)
    def bucket(a: Long): String =
      if (a <= 10) "a:<=10" else if (a <= 15) "b:11-15"
      else if (a <= 20) "c:16-20" else "d:21+"
    val stats = perUser.map { case (_, fd, ds) =>
      (bucket(ds.count(d0 => d0 - fd <= 6).toLong),
        ds.exists(d0 => d0 - fd >= 21 && d0 - fd <= 27))
    }
    val expected = stats.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, ss) =>
      val r = ss.count(_._2).toLong
      (b, ss.size.toLong, r, r * 1000000L / ss.size)
    }
    val got = Relational.q183Activation(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == perUser.size.toLong,
      "every observable user scored exactly once")
  }

  test("q184 returns equal a literal conditional-sum replay") {
    val pb = Tables.part(spark, d)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val rows = Tables.lineitem(spark, d)
      .select($"l_partkey", $"l_returnflag" === "R",
        round($"l_extendedprice" * 100, 0).cast("long"))
      .as[(Long, Boolean, Long)].collect().toSeq
      .map(r => (pb(r._1), r._2, r._3))
    val expected = rows.groupBy(_._1).toSeq.map { case (b, rs) =>
      val n = rs.size.toLong; val nr = rs.count(_._2).toLong
      val rc = rs.filter(_._2).map(r => BigInt(r._3)).sum
      val tc = rs.map(r => BigInt(r._3)).sum
      (b, n, nr, nr * 1000000L / n, rc.toLong, tc.toLong,
        (rc * 1000000 / tc).toLong)
    }.sortBy(r => (-r._4, r._1))
    val got = Relational.q184Returns(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q185 rapid repeats equal a literal pair replay; min gap inside " +
    "the window") {
    val os = Tables.orders(spark, d)
      .select($"o_custkey", round($"o_totalprice" * 100, 0).cast("long"),
        $"o_orderkey", to_date($"o_orderdate").cast("string"))
      .as[(Long, Long, Long, String)].collect().toSeq
      .map(o => (o._1, o._2, o._3, java.time.LocalDate.parse(o._4).toEpochDay))
    val expected = os.groupBy(_._1).toSeq.flatMap { case (cust, rs) =>
      val pairs = for {
        a <- rs; b <- rs
        if a._3 < b._3 && (b._4 - a._4).abs <= 7
      } yield (a._2 + b._2, (b._4 - a._4).abs)
      if (pairs.isEmpty) None
      else Some((cust, pairs.size.toLong, pairs.map(_._2).min,
        pairs.map(_._1).sum))
    }.sortBy(r => (-r._2, r._1))
    val got = Relational.q185RapidRepeat(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    got.foreach(r => assert(r._3 >= 0 && r._3 <= 7))
    assert(got.nonEmpty, "fixture must flag rapid repeats")
  }

  test("q186 price spread equals a literal floor-unit-price replay") {
    val pb = Tables.part(spark, d)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val rows = Tables.lineitem(spark, d)
      .select($"l_partkey", round($"l_extendedprice" * 100, 0).cast("long"),
        $"l_quantity".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2 * 100 / r._3))
    val perPart = rows.groupBy(_._1).toSeq.map { case (pk, rs) =>
      val lo = rs.map(_._2).min; val hi = rs.map(_._2).max
      (pk, if (lo > 0) Some((hi - lo) * 1000000L / lo) else None)
    }
    val expected = perPart.groupBy(p => pb(p._1)).toSeq.sortBy(_._1)
      .map { case (b, ps) =>
        val ws = ps.flatMap(_._2).max
        (b, ps.size.toLong, ps.flatMap(_._2).count(_ > 1000000L).toLong, ws,
          ps.filter(_._2.contains(ws)).map(_._1).min)
      }
    val got = Relational.q186PriceSpread(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    got.foreach(r => assert(r._3 <= r._2))
  }

  test("q189 ABC classes equal a literal Pareto-prefix replay; classes " +
    "partition parts and revenue exactly") {
    val revs = Tables.lineitem(spark, d)
      .select($"l_partkey", round($"l_extendedprice" * 100, 0).cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
      .sorted(Ordering[Long].reverse)
    val t = revs.map(BigInt(_)).sum
    def prefixCovering(target: BigInt): Int = {
      var cum = BigInt(0); var i = 0
      while (cum < target && i < revs.size) { cum += revs(i); i += 1 }
      i
    }
    val a = prefixCovering(t * 80 / 100)
    val ab = prefixCovering(t * 95 / 100)
    val np = revs.size.toLong
    val expected = Seq(
      ("A", a.toLong, revs.take(a).map(BigInt(_)).sum),
      ("B", (ab - a).toLong, revs.slice(a, ab).map(BigInt(_)).sum),
      ("C", (np - ab).toLong, revs.drop(ab).map(BigInt(_)).sum)
    ).map { case (c, n, r) =>
      (c, n, r.toLong, (r * 1000000 / t).toLong, n * 1000000L / np)
    }
    val got = Relational.q189AbcClasses(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == np && got.map(r => BigInt(r._3)).sum == t,
      "classes partition parts and revenue")
    assert(got.head._4 >= 800000L - 1000L, "A really covers ~80% of revenue")
  }

  test("q190 SLO burn equals a literal calendar-window replay") {
    val days = Tables.events(spark, d)
      .select(to_date($"ts").cast("string"), $"event_type" === "error")
      .as[(String, Boolean)].collect().toSeq
      .map { case (day, e) => (java.time.LocalDate.parse(day).toEpochDay, e) }
    val byDay = days.groupBy(_._1).view
      .mapValues(rs => (rs.size.toLong, rs.count(_._2).toLong)).toMap
    val slo = 210000L
    val expected = byDay.keys.toSeq.sorted.map { ed =>
      val (n, errs) = byDay(ed)
      val win = (ed - 6 to ed).flatMap(byDay.get)
      val n7 = win.map(_._1).sum; val e7 = win.map(_._2).sum
      val p1 = errs * 1000000L / n; val p7 = e7 * 1000000L / n7
      (java.time.LocalDate.ofEpochDay(ed).toString, n, errs, p1, p7,
        p1 * 1000 / slo, p7 * 1000 / slo)
    }
    val got = Relational.q190SloBurn(spark, d)
      .select($"day".cast("string"), $"n", $"errs", $"err_ppm_1d",
        $"err_ppm_7d", $"burn_1d_milli", $"burn_7d_milli")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    got.foreach(r => assert(r._3 <= r._2 && r._4 <= 1000000L))
  }

  test("q191 A/B readout equals a BigInt pooled-z2 replay") {
    val users = Tables.events(spark, d)
      .select($"user_id", $"event_type" === "purchase")
      .as[(Long, Boolean)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.exists(_._2)).toSeq
    val (a, b) = users.partition(_._1 % 2 == 0)
    val (n1, c1) = (a.size.toLong, a.count(_._2).toLong)
    val (n2, c2) = (b.size.toLong, b.count(_._2).toLong)
    val dNum = BigInt(c1) * n2 - BigInt(c2) * n1
    val den = BigInt(n1) * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
    val Array(got) = Relational.q191AbTest(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect()
    assert((got._1, got._2, got._3, got._4) == ((n1, c1, n2, c2)))
    assert(got._5 == c1 * 1000000L / n1 && got._6 == c2 * 1000000L / n2)
    assert(got._7 == got._5 - got._6)
    assert(got._8 == (if (den > 0)
      Some((dNum * dNum * (n1 + n2) * 1000 / den).toLong) else None))
    got._8.foreach(z => assert(z >= 0))
  }

  test("q192 also-bought equals a brute-force per-anchor lift replay") {
    val items = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val n = items.map(_._1).distinct.size.toLong
    val sup = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val heads = sup.toSeq.sortBy(r => (-r._2, r._1)).take(10)
    val baskets = items.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val expected = heads.flatMap { case (anchor, supA) =>
      val partners = baskets.filter(_.contains(anchor))
        .flatMap(_ - anchor)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      partners.map { case (p, supAp) =>
        (anchor, supA, p, sup(p), supAp,
          (BigInt(supAp) * n * 1000000 / (BigInt(supA) * sup(p))).toLong)
      }.sortBy(r => (-r._6, r._3)).take(3).zipWithIndex
        .map { case (r, i) =>
          (r._1, r._2, i + 1L, r._3, r._4, r._5, r._6)
        }
    }.sortBy(r => (r._1, r._3))
    val got = Relational.q192AlsoBought(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.size == 10, "all ten anchors present")
    got.groupBy(_._1).values.foreach(rs =>
      assert(rs.map(_._3).sorted == (1L to rs.size)))
  }
}
