package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q136 interval union, q137 bitmap distinct, q138 k-anonymity: plain
  * Scala replays from collected fixture rows pin the sweep-merge
  * semantics (abutting intervals merge), the popcount==true-distinct law,
  * and the suppression arithmetic, independently of the DuckDB oracle.
  */
class CoverageBitmapAnonSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val IvUs = 600L * 1000000L

  test("q136 interval union equals a sweep-merge replay and beats the " +
    "naive sum exactly where overlap exists") {
    val rows = Tables.events(spark, d)
      .select($"user_id", expr("unix_micros(ts)").as("us"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, evs) =>
      val ivs = evs.sortBy(e => (e._2, e._3)).map(e => (e._2, e._2 + IvUs))
      // sweep: new island iff start exceeds the running max of prior ends
      val islands = ivs.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, (st, en)) =>
          // constant width + sorted starts => the running max of prior
          // ends IS the current island's end
          if (acc.nonEmpty && st <= acc.last._2)
            acc.init :+ ((acc.last._1, acc.last._2.max(en), acc.last._3 + 1))
          else acc :+ ((st, en, 1L))
      }
      val covered = islands.map(i => i._2 - i._1).sum
      (u, islands.size.toLong, evs.size.toLong, covered,
        islands.map(_._3).max, covered * 1000000L / (evs.size * IvUs))
    }
    val got = Warehouse.q136IntervalUnion(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._6 < 1000000L),
      "fixture should contain overlapping intervals (utilization < 1e6)")
    assert(got.forall(_._6 <= 1000000L), "union can never exceed the naive sum")
  }

  test("q137 bitmap pyramid: popcounts equal true distincts at both grains") {
    val rows = Tables.events(spark, d)
      .select($"event_type", to_date($"ts").cast("string"), $"user_id")
      .as[(String, String, Long)].collect()
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val sumDaily = rs.groupBy(_._2).values.map(_.map(_._3).distinct.size.toLong).sum
      val total = rs.map(_._3).distinct.size.toLong
      (et, sumDaily, total, (sumDaily - total) * 1000000L / sumDaily)
    }
    val got = Warehouse.q137BitmapDistinct(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.forall { case (_, s, t, _) => s >= t },
      "daily sum can never undercount the merged distinct")
    assert(got.exists(_._4 > 0), "fixture should contain returning users")
  }

  test("q138 k-anonymity equals a QI-group replay; suppression bounded") {
    val rows = graft.sources.Layouts.documents(spark, d)
      .select($"lang", $"source", expr("n_chars DIV 256"))
      .as[(String, String, Long)].collect()
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq
      .sortBy(_._1).map { case ((lang, src), rs) =>
        val sizes = rs.groupBy(_._3).values.map(_.size.toLong).toSeq
        val suppressed = sizes.filter(_ < 5).sum
        (lang, src, rs.size.toLong, sizes.size.toLong, suppressed,
          sizes.min, suppressed * 1000000L / rs.size)
      }
    val got = Privacy.q138KAnonymity(spark, d)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._5 > 0),
      "fixture should contain re-identifiable (sub-k) QI groups")
  }

  test("q148 l-diversity equals a sensitive-value replay; homogeneity " +
    "flagged iff one source per QI group") {
    val rows = graft.sources.Layouts.documents(spark, d)
      .select($"lang", expr("n_chars DIV 256"), $"source")
      .as[(String, Long, String)].collect()
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, rs) =>
      val groups = rs.groupBy(_._2).values.toSeq
      val perGroup = groups.map { g =>
        val bySrc = g.groupBy(_._3).values.map(_.size.toLong).toSeq
        (g.size.toLong, bySrc.size.toLong, bySrc.max)
      }
      val homo = perGroup.filter(_._2 == 1)
      val nDocs = perGroup.map(_._1).sum
      (lang, perGroup.size.toLong, nDocs, perGroup.map(_._2).min,
        homo.size.toLong, homo.map(_._1).sum * 1000000L / nDocs,
        perGroup.map(g => g._3 * 1000000L / g._1).max)
    }
    val got = Privacy.q148LDiversity(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.forall(_._7 <= 1000000L))
    assert(got.forall(r => (r._5 == 0) == (r._6 == 0)),
      "homogeneous doc mass is zero exactly when no homogeneous groups")
  }
}
