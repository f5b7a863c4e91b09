package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExpressions

/** The perceptual-hash kernel and the q198 near-dup chain: hand-computed
  * band values, locality (small edits move few bits), the short-payload
  * null, and the planted near-dup pair on the driver fixture.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def bandsOf(text: String): Option[Seq[Long]] = {
    val r = Seq(text).toDF("t")
      .select(VectorExpressions.phashBands(col("t")).as("b"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  test("hand-computed signature on a 64-char ramp") {
    // 64 chars, one per block; block sums are the code points.
    // codepoints 'a'+0 .. 'a'+63 (97..160), total = 64*97 + 2016 = 8224,
    // mean block sum = 128.5 -> bit b set iff 97+b > 128.5 iff b >= 32:
    // bands 0,1 all zero; bands 2,3 all ones (0xFFFF).
    val ramp = (0 until 64).map(i => ('a' + i).toChar).mkString
    assert(bandsOf(ramp).contains(Seq(0L, 0L, 65535L, 65535L)))
  }

  test("locality: a one-char edit moves few bits; reordering blocks moves many") {
    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val base = ("the quick brown fox jumps over the lazy dog " * 8).take(256)
    val edit = base.updated(100, 'X')
    val h = hamming(bandsOf(base).get, bandsOf(edit).get)
    assert(h <= 3, s"one-char edit moved $h of 64 bits")
    val scrambled = base.reverse
    assert(hamming(bandsOf(base).get, bandsOf(scrambled).get) > h)
  }

  test("payloads shorter than 64 code points have no signature") {
    assert(bandsOf("too short").isEmpty)
    assert(bandsOf("x" * 63).isEmpty)
    assert(bandsOf("x" * 64).isDefined)
  }

  test("q198 finds the planted near-dup pair on the driver fixture") {
    val rows = LlmOps.q198PhashNearDup(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // docs 0 and 140 are near-identical; their thumbnails land 2 bits apart
    assert(rows.contains((0L, 140L)), s"planted pair missing: ${rows.keys}")
    val (ham, flag) = rows((0L, 140L))
    assert(ham <= 3 && flag == 1L)
    // candidates beyond the radius surface with near_dup = 0
    assert(rows.values.exists(_._2 == 0L),
      "far candidates should appear unflagged")
  }

  test("phash_bands is registered as a SQL function") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      s"SELECT phash_bands('${"ab" * 64}') AS b").collect()(0).getSeq[Long](0)
    assert(got.length == 4)
  }
}
