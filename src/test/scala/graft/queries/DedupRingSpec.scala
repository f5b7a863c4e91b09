package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q208 must agree with the leg queries it composes: the capstone's
  * per-leg pair/doc counts are recomputed here directly from the
  * flagged outputs of q198/q200/q204.
  */
class DedupRingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("capstone counts equal the legs' own flagged outputs") {
    val got = LlmOps.q208DedupRing(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("text_exact", "image", "audio", "temporal"))

    def legCounts(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val f = pairs.filter(col("near_dup") === 1).collect()
      val docs = f.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      (f.length.toLong, docs.length.toLong)
    }
    assert(got("image") == legCounts(LlmOps.q198PhashNearDup(spark, sf)))
    assert(got("audio") == legCounts(LlmOps.q200AudioFingerprint(spark, sf)))
    assert(got("temporal") == legCounts(LlmOps.q204FrameNearDup(spark, sf)))
    // the synthetic fixture has no byte-identical documents
    assert(got("text_exact") == ((0L, 0L)))
  }
}
