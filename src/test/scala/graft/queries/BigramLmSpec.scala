package graft.queries

import graft.SparkSpec

/** q201's stupid-backoff bits on a corpus small enough to hand-compute:
  * seen bigrams charge floorlog2(c(w1)) − floorlog2(c(w1,w2)); unseen
  * ones charge the backoff 3 + floorlog2(T) − floorlog2(c(w2) max 1).
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Writes a documents.parquet mini-fixture and returns its dir. */
  private def fixture(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_").toString
    docs.map { case (id, text) => (id, text, "en", s"src$id", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-computed bits: fluent text scores 0, novel words pay backoff") {
    // train (doc_id % 5 != 0): unigrams the:3 cat:3 sat:3 ran:1 dog:1 a:1
    // → T = 12; bigrams (the,cat):2 (cat,sat):2 (cat,ran):1 (the,dog):1
    // (dog,sat):1 (a,cat):1
    val d = fixture(Seq(
      1L -> "the cat sat", 2L -> "the cat ran",
      3L -> "the dog sat", 4L -> "a cat sat",
      // scored (doc_id % 5 == 0):
      0L -> "the cat sat",   // both bigrams seen: fb(3)-fb(2) = 2-2 = 0 twice
      5L -> "the zebra sat", // unseen w2: 3+fb(12)-fb(1) = 6; seen w2 sat:
                             // 3+fb(12)-fb(3) = 3+4-2 = 5
      10L -> "one"))         // single token → no bigrams → absent
    val got = LlmOps.q201BigramLm(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      0L -> ((2L, 0L, 0L)),
      5L -> ((2L, 11L, 5500L))))
  }

  test("q201 on the driver fixture: every held-out multi-token doc scores") {
    val rows = LlmOps.q201BigramLm(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 100) // 500 docs, ids 0,5,…; all multi-token
    assert(rows.forall(_.getLong(3) >= 0L), "bits are non-negative")
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }
}
