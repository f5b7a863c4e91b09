package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q252's drift contract: the per-generation recall audit over an
  * incremental IVFADC layout must SURFACE a drifted delta — vectors in
  * a region the frozen PQ codebook cannot represent — as a recall gap
  * against the base and a RESOLVABLE delta (one the frozen quantizers
  * still encode distinctly). This is the rebuild trigger the
  * frozen-quantizer posture (q250/q251) relies on: without it, drift
  * decays recall silently while the probe keeps returning K answers.
  */
class IvfAdcDriftSpec extends SparkSpec {
  import spark.implicits._

  private def vec(f: Int => Double): Array[Float] =
    Array.tabulate(64)(d => f(d).toFloat)

  // base: 4 clusters, one 8-dim block each in the FIRST 32 dims;
  // dims 32..63 are EXACTLY zero, so the frozen codebook entries for
  // those subspaces all train to the zero vector — that is the region
  // the drifted delta will land in
  private def baseRows: Seq[(Long, Long, Array[Float])] =
    (1L to 80L).map { id =>
      val lab = id % 4 + 1
      (id, lab, vec(d =>
        if (d / 8 == lab - 1) 1.0 + 0.01 * ((id + d) % 5)
        else if (d < 32) 0.01 * ((id * 7 + d) % 3)
        else 0.0))
    }

  // drifted delta: all mass in dims 32..63 — every frozen codebook
  // entry there is 0, so all drifted vectors encode to the SAME codes
  // and ADC cannot rank them (vec_id tie-break only): recall collapses
  private def driftedRows: Seq[(Long, Array[Float])] =
    (201L to 220L).map { id =>
      (id, vec(d =>
        if (d >= 32 && (d - 32) / 8 == id % 4) 2.0 + 0.01 * ((id + d) % 5)
        else 0.0))
    }

  test("planted drifted delta: the audit surfaces a per-generation recall gap") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfadcdrift_").toString
    LlmOps.ivfAdcBuildBase(spark,
      baseRows.toDF("vec_id", "label", "embedding"), dir)
    // RESOLVABLE delta (the healthy control): each vector sits exactly
    // AT a frozen codebook entry (one entry per subspace, picked by
    // id), so the frozen quantizers encode it with zero quantization
    // error and a code combination no base member shares — ADC ranks
    // its twin query onto it without ties. "Healthy" = the quantizers
    // still REPRESENT the delta; recall stays high.
    val codebook = spark.read.parquet(s"$dir/codebook")
      .as[(Int, Long, Array[Long])].collect()
      .map { case (m, k, cv) => (m, k) -> cv }.toMap
    val resolvableRows: Seq[(Long, Array[Float])] =
      (101L to 120L).map { id =>
        val cv = (0 until 8).flatMap(m => codebook((m, id % 16)))
        (id, cv.map(q => (q.toDouble / (1L << 20)).toFloat).toArray)
      }
    LlmOps.ivfAdcAppendDelta(spark,
      resolvableRows.toDF("vec_id", "embedding"), dir, 1L)
    LlmOps.ivfAdcAppendDelta(spark,
      driftedRows.toDF("vec_id", "embedding"), dir, 2L)
    val corpus = (baseRows.map(r => (r._1, r._3)) ++ resolvableRows ++ driftedRows)
      .toDF("vec_id", "embedding")
    // panel: twins of base, resolvable-delta, and drifted-delta vectors
    // — each generation's region is queried, so each generation holds
    // exact-truth slots the probe must recover
    val panel = Seq(
      (1001L, baseRows.head._3), (1002L, baseRows(1)._3),
      (1003L, resolvableRows(2)._2), (1004L, resolvableRows(3)._2),
      (2001L, driftedRows.head._2), (2002L, driftedRows(5)._2),
      (2003L, driftedRows(10)._2)).toDF("q_id", "embedding")
    val audit = LlmOps.ivfAdcDriftAudit(spark, dir, corpus, panel)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(audit.map(_._1) == Seq(0L, 1L, 2L),
      s"every generation must hold truth slots and be audited: $audit")
    val recall = audit.map(r => r._1 -> r._4).toMap
    audit.foreach { case (g, nTruth, nHit, ppm) =>
      assert(nTruth > 0 && nHit >= 0 && nHit <= nTruth)
      assert(ppm == 1000000L * nHit / nTruth, s"gen $g ppm arithmetic")
    }
    // the planted gap: trained/resolvable generations recover well; the
    // drifted generation's recall collapses by a wide margin
    assert(recall(2L) + 200000L <= recall(0L).min(recall(1L)),
      s"drifted generation must show the recall gap: $audit")
    assert(recall(0L) >= 600000L && recall(1L) >= 600000L,
      s"trained-region generations must stay healthy: $audit")
    assert(recall(2L) <= 400000L,
      s"drifted generation must be flagged unhealthy: $audit")
  }
}
