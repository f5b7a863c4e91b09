package graft.queries

import graft.SparkSpec

/** q216's sublinear cell budgets and deterministic selection. */
class DiversitySampleSpec extends SparkSpec {

  private def isqrt(n: Long): Long = {
    var s = math.sqrt(n.toDouble).toLong
    while ((s + 1) * (s + 1) <= n) s += 1
    while (s * s > n) s -= 1
    s
  }

  test("quota law: min(n, 4*isqrt(n)), filled exactly, sublinear on big cells") {
    val rows = LlmOps.q216DiversitySample(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, quota, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(quota == math.min(n, 4L * isqrt(n)), s"quota law: $r")
      assert(kept == quota, s"budget must be filled exactly: $r")
    }
    // the de-clustering point: at least one cell is big enough to be
    // sublinearly compressed (kept < members)
    assert(rows.exists(r => r.getLong(3) < r.getLong(1)),
      "fixture should contain at least one compressed cell")
  }

  test("selection is deterministic: checksums identical across runs") {
    val a = LlmOps.q216DiversitySample(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    val b = LlmOps.q216DiversitySample(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    assert(a == b)
  }
}
