package graft.queries

import graft.SparkSpec
import graft.functions.PolyHash

/** q202's importance algebra on a crafted corpus: raw docs that share
  * the target's hashed-bigram features outrank disjoint ones, with the
  * exact integer ratios recomputed here from [[PolyHash.horner]].
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(docs: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_").toString
    docs.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("target-like raw docs outrank disjoint ones, with exact ratios") {
    // src0/src4 → target (id % 4 == 0); src1/src2 → raw
    val d = fixture(Seq(
      (1L, "src0", "alpha beta alpha beta alpha"),
      (2L, "src4", "alpha beta gamma"),
      (3L, "src1", "alpha beta alpha"),  // target-like raw doc
      (4L, "src2", "zulu yankee zulu"))) // disjoint raw doc
    val got = LlmOps.q202Dsir(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // recompute expected ratios: fb(ct+1) − fb(cr+1) per hashed bigram
    def b(g: String): Long = PolyHash.horner(g) % 8192L
    val grams = Seq("alpha beta", "beta alpha", "beta gamma",
      "zulu yankee", "yankee zulu")
    assert(grams.map(b).distinct.length == grams.length,
      "crafted bigrams must not collide for the hand-math to hold")
    def fb(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    // target counts: (alpha,beta):3 (beta,alpha):2 (beta,gamma):1
    // raw counts:    (alpha,beta):1 (beta,alpha):1 (zulu,yankee):1 (yankee,zulu):1
    val lrAB = fb(3 + 1) - fb(1 + 1) // 3-2 = 1
    val lrBA = fb(2 + 1) - fb(1 + 1) // 2-2 = 0
    val lrZY = fb(0 + 1) - fb(1 + 1) // 1-2 = -1
    assert(got.toSeq == Seq(
      (3L, 2L, lrAB + lrBA), // importance 1
      (4L, 2L, 2 * lrZY)))   // importance -2; target docs never appear
  }

  test("q202 on the driver fixture selects exactly DsirTopK raw docs") {
    val rows = LlmOps.q202Dsir(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 100)
    val imps = rows.map(_.getLong(2)).toSeq
    assert(imps == imps.sorted.reverse, "descending importance order")
  }
}
