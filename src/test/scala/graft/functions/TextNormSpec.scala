package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def normOf(s: String): String =
    Seq(s).toDF("t").select(TextNorm.nfcNormalize(col("t"))).as[String].head()

  test("NFC composes decomposed sequences; composed and ASCII text pass through") {
    val decomposed = "Cafe\u0301 au lait" // e + COMBINING ACUTE ACCENT
    val composed = "Caf\u00e9 au lait"    // e-acute as one code point
    assert(decomposed != composed && normOf(decomposed) == composed)
    assert(normOf(composed) == composed, "NFC is idempotent")
    assert(normOf("plain ascii") == "plain ascii")
    assert(normOf("A\u0301") == "\u00c1") // A + acute -> precomposed
  }

  test("codegen path equals interpreted path; null passes through") {
    val df = Seq("Cafe\u0301", "abc", null.asInstanceOf[String]).toDF("t")
    val out = df.select(TextNorm.nfcNormalize(col("t"))).collect()
    val expected = Seq("Caf\u00e9", "abc", null)
    assert(out.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq == expected)
  }

  test("normalizeDoc makes canonically-equivalent texts hash-identical") {
    // the motivating property: without NFC + casefold + whitespace
    // collapse, these spellings of the same text slip past content-hash
    // exact dedup
    val df = Seq("Cafe\u0301  RACLETTE", "Caf\u00e9 raclette").toDF("text")
    val hashes = df.select(xxhash64(TextNorm.normalizeDoc(col("text")))).as[Long].collect()
    assert(hashes(0) == hashes(1), "normalized forms must collide in exact dedup")
    val raw = df.select(xxhash64(col("text"))).as[Long].collect()
    assert(raw(0) != raw(1), "un-normalized forms do not")
  }
}
