package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q129 distribution drift: TV distance replayed exactly in Scala with
  * BigInt arithmetic, plus the degenerate-case invariants.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q129 equals a BigInt Scala replay of the cross-multiplied TV") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val expected = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      val toks = ds.flatMap { case (id, _, text) =>
        text.trim.toLowerCase.split("\\s+").toSeq.map(w => (id % 2 == 0, w))
      }
      val byW = toks.groupBy(_._2).map { case (w, rs) =>
        w -> (rs.count(_._1).toLong, rs.count(!_._1).toLong)
      }
      val na = BigInt(byW.values.map(_._1).sum)
      val nb = BigInt(byW.values.map(_._2).sum)
      val num = byW.values.map { case (ca, cb) =>
        (BigInt(ca) * nb - BigInt(cb) * na).abs
      }.sum
      val tv =
        if (na == 0 || nb == 0) None
        else Some((num * 1000000 / (2 * na * nb)).toLong)
      (src, na.toLong, nb.toLong, byW.size.toLong, tv)
    }.sortBy(_._1)
    val got = Corpus.q129DistDrift(spark, d)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    got.foreach { case (src, _, _, _, tv) =>
      tv.foreach(t =>
        assert(t >= 0 && t <= 1000000, s"$src: TV ppm out of [0, 1e6]: $t"))
    }
  }

  test("identical slices drift to exactly zero") {
    // feed the SAME tokens on both parities: TV must be 0, not epsilon
    val docs = Seq(
      (0L, "s", "alpha beta beta"), (1L, "s", "alpha beta beta"),
      (2L, "s", "gamma"), (3L, "s", "gamma"))
      .toDF("doc_id", "source", "text")
    val counts = docs
      .select(col("source"), (col("doc_id") % 2 === 0).as("a"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("source", "w")
      .agg(count_if(col("a")).as("c_a"), count_if(!col("a")).as("c_b"))
    val totals = counts.groupBy("source")
      .agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val tv = counts.join(broadcast(totals), Seq("source"))
      .groupBy("source")
      .agg(sum(abs(col("c_a").cast("decimal(38,0)") * col("n_b")
        - col("c_b").cast("decimal(38,0)") * col("n_a"))).as("num"))
      .select("num").as[java.math.BigDecimal].collect()
    assert(tv.map(_.longValueExact()).toSeq == Seq(0L))
  }
}
