package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.PolyHash

/** q132 SCD2, q133 chunk dup-mass, q134 median/MAD, q135 sequence
  * contexts: each audit is replayed independently in plain Scala from the
  * collected fixture rows, so the interval semantics, min-span rule,
  * lower-median definition, and argmax tie-breaks are pinned by a second
  * implementation — not just by the DuckDB oracle re-deriving the same
  * SQL shape.
  */
class Scd2RobustSeqSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private val Types = Seq("click", "error", "purchase", "signup", "view")

  private def eventSeqs: Map[Long, Seq[(Long, Long, String)]] =
    Tables.events(spark, d)
      .select($"user_id", expr("unix_micros(ts)").as("us"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(r => (r._2, r._3, r._4)).sortBy(r => (r._1, r._2)).toSeq
      }

  test("q132 SCD2: versions, current state, and longest closed version " +
    "equal an interval replay") {
    val got = Warehouse.q132Scd2(spark, d)
      .select($"user_id", $"n_events", $"n_versions", $"n_reentries",
        $"current_state", $"current_since".cast("long"), $"longest_us",
        $"longest_state")
      .as[(Long, Long, Long, Long, String, Long, Option[Long], Option[String])]
      .collect().sortBy(_._1).toSeq
    // current_since cast: timestamp→long is SECONDS in Spark; replay the
    // same truncation from micros.
    val expected = eventSeqs.toSeq.sortBy(_._1).map { case (u, evs) =>
      // collapse consecutive runs of the same type into versions
      val versions = evs.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (us, _, t)) =>
          if (acc.nonEmpty && acc.last._1 == t)
            acc.init :+ ((t, acc.last._2, acc.last._3 + 1))
          else acc :+ ((t, us, 1L))
      } // (state, valid_from_us, n_events)
      val closed = versions.zip(versions.tail).map { case ((st, f, _), (_, t, _)) =>
        (st, t - f)
      }
      val longest = closed.sortBy { case (st, dur) =>
        (dur, Types.indexOf(st))
      }.lastOption
      (u, evs.size.toLong, versions.size.toLong,
        versions.size.toLong - versions.map(_._1).distinct.size,
        versions.last._1, versions.map(_._2).max / 1000000L,
        longest.map(_._2), longest.map(_._1))
    }
    assert(got == expected)
    assert(got.exists(_._4 > 0), "fixture should contain state re-entries")
    assert(got.exists(_._7.isDefined), "fixture should contain closed versions")
  }

  test("q133 chunk dup-mass equals a Scala chunker replay and obeys bounds") {
    val docs = graft.sources.Layouts.documents(spark, d)
      .select($"source", $"text").as[(String, String)].collect()
    val chunks = docs.toSeq.flatMap { case (src, text) =>
      text.trim.split("\\s+").toSeq.grouped(32).map { toks =>
        (src, PolyHash.horner(toks.mkString(" ")), toks.size)
      }
    }
    val byHash = chunks.groupBy(_._2).map { case (h, cs) => h -> cs.size }
    val expected = chunks.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, cs) =>
      val dup = cs.count(c => byHash(c._2) > 1 && c._3 == 32).toLong
      (src, cs.size.toLong, cs.map(_._2).distinct.size.toLong, dup,
        dup * 1000000L / cs.size)
    }
    val out = Corpus.q133ChunkDupmass(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == expected)
    assert(out.forall { case (_, n, dist, dup, ppm) =>
      dist <= n && dup <= n && ppm <= 1000000L
    })
  }

  test("q134 robust stats: lower median, MAD, and outlier mass equal an " +
    "exact integer replay") {
    val rows = Tables.events(spark, d)
      .select($"event_type", round($"value" * 100, 0).cast("long").as("cents"))
      .as[(String, Long)].collect()
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.size + 1) / 2 - 1) // ceil(n/2)-th order statistic, 0-based
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val cents = rs.map(_._2).toSeq
      val med = lowerMedian(cents)
      val devs = cents.map(c => math.abs(c - med))
      val mad = lowerMedian(devs)
      val out = devs.count(_ > 3 * mad).toLong
      (et, cents.size.toLong, med, mad, out, out * 1000000L / cents.size)
    }
    val got = Warehouse.q134RobustStats(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._5 > 0), "fixture should contain MAD outliers")
  }

  test("q135 sequence contexts equal a sliding 4-gram replay with " +
    "largest-label tie-break") {
    val grams = eventSeqs.values.toSeq.flatMap { evs =>
      val ts = evs.map(_._3)
      if (ts.size >= 4) ts.sliding(4).map(g => (g.init.mkString(">"), g.last)).toSeq
      else Seq.empty
    }
    val expected = grams.groupBy(_._1).toSeq.sortBy(_._1).map { case (ctx, gs) =>
      val byLabel = gs.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
      val (topLabel, topCnt) = byLabel.toSeq.sortBy { case (l, c) =>
        (c, Types.indexOf(l))
      }.last
      (ctx, gs.size.toLong, byLabel.size.toLong, topLabel,
        topCnt * 1000000L / gs.size)
    }
    val got = Warehouse.q135SeqContexts(spark, d)
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum ==
      eventSeqs.values.map(e => math.max(0, e.size - 3)).sum,
      "every event with 3 predecessors yields exactly one example")
  }
}
