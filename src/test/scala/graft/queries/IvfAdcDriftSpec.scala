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
      .select("batch_id", "n_truth", "n_hit", "recall_ppm")
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

  test("drift -> trip -> rebuild -> recovered recall: ivfAdcRebuildIfDrifted " +
    "republishes a fresh layout whose audit is clean, and the stream " +
    "re-points at it") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfadcrb_").toString
    LlmOps.ivfAdcBuildBase(spark,
      baseRows.toDF("vec_id", "label", "embedding"), dir)
    LlmOps.ivfAdcAppendDelta(spark,
      driftedRows.toDF("vec_id", "embedding"), dir, 1L)
    val corpus = (baseRows.map(r => (r._1, r._3)) ++ driftedRows)
      .toDF("vec_id", "embedding")
    // a drifted QUERY is a member twin plus an ε of base mass in dims
    // 8..31: the frozen coarse probe ranks the three base cells whose
    // blocks that ε grazes ABOVE the all-ties cell the drifted members
    // sit in (nprobe = 3 of 4), so the probe never reaches them — the
    // realistic drift failure mode (mis-routed queries + mis-celled
    // members), and the recall for the drifted generation collapses to
    // zero. The ε is a constant offset to every drifted candidate's
    // exact distance, so ground truth is unaffected.
    def driftedQuery(m: Array[Float]): Array[Float] =
      m.zipWithIndex.map { case (x, d) =>
        if (d >= 8 && d < 32) (x + 0.05).toFloat else x
      }
    val panel = Seq(
      (1001L, baseRows.head._3), (1002L, baseRows(1)._3),
      (2001L, driftedQuery(driftedRows.head._2)),
      (2002L, driftedQuery(driftedRows(5)._2)),
      (2003L, driftedQuery(driftedRows(10)._2))).toDF("q_id", "embedding")
    // 1. the audit TRIPS: the drifted generation is rebuild_due (the
    // base generation stays above the trigger)
    val audit0 = LlmOps.ivfAdcDriftAudit(spark, dir, corpus, panel)
      .select($"batch_id", $"recall_ppm", $"rebuild_due")
      .as[(Long, Long, Long)].collect().toSeq
    val audit = audit0.map(r => r._1 -> r._3).toMap
    assert(audit(1L) == 1L && audit(0L) == 0L,
      s"rebuild_due must fire on the drifted generation only: $audit0")
    // 2. the loop ACTS: a fresh layout is republished from the union
    // corpus — re-seeded coarse cells (the drifted id region now owns
    // cells) and a re-trained codebook (dims 32..63 now carry mass)
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfadcrb2_").toString + "/layout"
    assert(LlmOps.ivfAdcRebuildIfDrifted(spark, dir, corpus, panel, out),
      "a tripped audit must trigger the rebuild")
    assert(new java.io.File(s"$out/cents").exists() &&
      new java.io.File(s"$out/codebook").exists())
    // the rebuilt layout holds the SAME corpus, re-based as generation 0
    val ids = spark.read.parquet(s"$out/codes")
      .select("vec_id").as[Long].collect().toSet
    assert(ids == corpus.select("vec_id").as[Long].collect().toSet,
      "rebuild must re-encode everything, never drop")
    assert(spark.read.parquet(s"$out/codes")
      .select("batch_id").distinct().as[Long].collect().toSeq == Seq(0L))
    // 3. RECOVERY: the rebuilt audit is clean — no generation trips,
    // and the previously-collapsed drifted region recovers
    val after = LlmOps.ivfAdcDriftAudit(spark, out, corpus, panel)
      .select($"batch_id", $"recall_ppm", $"rebuild_due")
      .as[(Long, Long, Long)].collect().toSeq
    assert(after.nonEmpty && after.forall(_._3 == 0L),
      s"post-rebuild audit must be clean: $after")
    assert(after.forall(_._2 > LlmOps.IvfRebuildMinRecallPpm),
      s"post-rebuild recalls must sit above the trigger: $after")
    // 4. RE-POINT: the ingest stream continues against the fresh layout
    // (a new checkpoint starts at batch 0 -> generation 1)
    val more = (401L to 410L).map(id =>
      (id, vec(d => if (d / 8 == 0) 1.0 + 0.01 * ((id + d) % 5) else 0.0)))
    graft.streaming.IvfAdcIngestStream.ingest(out)(
      more.toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$out/codes")
      .select("batch_id").distinct().as[Long].collect().toSet == Set(0L, 1L),
      "the re-pointed stream must land cleanly")
    // a healthy continuation does NOT re-trip
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_ivfadcrb3_").toString + "/never_built"
    assert(!LlmOps.ivfAdcRebuildIfDrifted(spark, out,
      corpus.unionByName(more.toDF("vec_id", "embedding")), panel, out2))
    assert(!new java.io.File(out2).exists(), "no trip -> no layout")
    // the original layout was left untouched for forensics/rollback
    assert(LlmOps.ivfAdcDriftAudit(spark, dir, corpus, panel)
      .filter($"rebuild_due" === 1L).count() == 1L)
  }
}
