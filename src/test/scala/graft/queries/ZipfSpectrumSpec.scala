package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class ZipfSpectrumSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q100 matches an independent vocabulary recomputation exactly") {
    val counts = Tables.documents(spark, d)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val total = counts.map(_._2).sum
    val expected = counts.groupBy(r => 64 - java.lang.Long.numberOfLeadingZeros(r._2))
      .map { case (band, rows) =>
        val occ = rows.map(_._2).sum
        (band.toLong, rows.length.toLong, occ, rows.map(_._2).min,
          rows.map(_._2).max, occ * 1000000L / total)
      }.toSeq.sortBy(-_._1)
    val out = Corpus.q100ZipfSpectrum(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == expected)
  }

  test("q100 bands partition the vocabulary: counts within [2^(b-1), 2^b)") {
    val out = Corpus.q100ZipfSpectrum(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (band, nTypes, occ, minC, maxC, share) =>
      assert(minC >= (1L << (band - 1)) && maxC < (1L << band),
        s"band $band must hold counts in [2^${band - 1}, 2^$band)")
      assert(nTypes >= 1L && occ >= minC)
      assert(share >= 0L && share <= 1000000L)
    }
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted.reverse,
      "bands arrive in descending order")
  }
}
