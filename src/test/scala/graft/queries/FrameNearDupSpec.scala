package graft.queries

import graft.SparkSpec

/** q204's frame-shingle algebra: shared consecutive frames make a
  * flagged pair, REVERSED frame order shares nothing (temporal order is
  * the point of shingling), and the planted cross-temporal pair on the
  * driver fixture surfaces at full containment.
  */
class FrameNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** A 64-char frame with WELL-MIXED per-frame content: a low-period
    * pattern (e.g. alternating two chars) collapses every frame onto
    * the same two pHash signatures and everything pairs with
    * everything. Verified: 16 consecutive frames → 16 distinct sigs. */
  private def frame(i: Int): String =
    (0 until 64).map { j =>
      ('a' + ((i.toLong * 1000003L + j) * 2654435761L % 26)).toChar
    }.mkString

  private def fixture(docs: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vid_").toString
    docs.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("shared consecutive frames pair up; reversed order shares nothing") {
    val fwd = (0 until 5).map(frame).mkString            // F0..F4
    val ext = fwd + frame(5)                             // F0..F5
    val rev = (4 to 0 by -1).map(frame).mkString         // F4..F0
    val other = (10 until 15).map(frame).mkString        // disjoint
    val d = fixture(Seq(
      (1L, "src1", fwd), (2L, "src2", ext),
      (3L, "src4", rev), (4L, "src5", other)))
    val got = LlmOps.q204FrameNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1's 3 shingles are a prefix of doc 2's 4 -> containment 1.0
    assert(got.keySet == Set((1L, 2L)), s"unexpected pairs: ${got.keySet}")
    assert(got((1L, 2L)) == ((3L, 1000000L, 1L)))
  }

  test("q204 finds the planted temporal-media pair on the driver fixture") {
    val rows = LlmOps.q204FrameNearDup(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // docs 285/301 share their first 7 frames (301 is 4 chars shorter)
    assert(rows.contains((285L, 301L)), s"planted pair missing: ${rows.keys}")
    assert(rows((285L, 301L)) == ((5L, 1000000L, 1L)))
  }
}
