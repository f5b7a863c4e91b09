package graft.queries

import graft.SparkSpec

/** q210's product-quantization ADC audit on crafted corpora where the
  * right answer is forced by construction, plus fixture invariants.
  *
  * Panel rule reminder: vec_id % 50 == 0 picks the query points, so a
  * 60-vector corpus has queries {0, 50}.
  */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  private def hist(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("identical vectors: both rankings collapse to vec_id order, overlap = K") {
    // every distance (exact AND ADC) ties at the same value, so both
    // top-10 lists are the 10 smallest non-self vec_ids — overlap 10
    // for each of the two panel queries, entirely from the tie rules
    val u = Array.tabulate(64)(i => (((i % 5) - 2) * 0.1).toFloat)
    val e = (0L until 60L).map(id => (id, u)).toDF("vec_id", "embedding")
    assert(hist(LlmOps.pqRecallAudit(e)) == Seq((10L, 2L)))
  }

  test("two exact clusters: ADC separates them, overlap = K") {
    // cluster U = ids 0..29 all exactly u, cluster W = ids 30..59 all
    // exactly -u. Each cluster's members pick the centroid with the
    // highest own-cluster fraction, every cross-cluster LUT entry is
    // strictly larger, and ties inside a cluster break by vec_id — so
    // ADC top-10 == exact top-10 for both queries (q0 in U, q50 in W)
    val u = Array.tabulate(64)(i => (((i % 7) - 3) * 0.08).toFloat)
    val w = u.map(-_)
    val e = ((0L until 30L).map(id => (id, u)) ++
      (30L until 60L).map(id => (id, w))).toDF("vec_id", "embedding")
    assert(hist(LlmOps.pqRecallAudit(e)) == Seq((10L, 2L)))
  }

  test("fixture: histogram mass equals the panel, overlap bounded, deterministic") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val h1 = hist(LlmOps.pqRecallAudit(e))
    val nPanel = e.filter("vec_id % 50 = 0 AND vec_id < 50000").count()
    assert(h1.map(_._2).sum == nPanel, s"mass: $h1 vs panel $nPanel")
    assert(h1.forall { case (ov, _) => ov >= 0 && ov <= 10 })
    // strictly descending overlap levels (the orderBy is total)
    assert(h1.map(_._1) == h1.map(_._1).sorted.reverse)
    // integer arithmetic end-to-end: a second run is bit-identical
    assert(hist(LlmOps.pqRecallAudit(e)) == h1)
  }

  test("one corpus scan: the quantized frame is checkpointed and shared") {
    val df = LlmOps.pqRecallAudit(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    assert(scans == 0 && finalPlan.contains("ExistingRDD"),
      s"all five consumers must read the one checkpointed quantized " +
        s"frame, not re-scan the vector column (scans=$scans)")
  }

  test("q244 probe reads the published layouts, never re-trains; reuse is bit-identical") {
    val sf = "/root/testdata/sf0.001"
    val a = LlmOps.q244PqIndex(spark, sf).collect().toSeq
    assert(a.nonEmpty && a.forall(_.getLong(3) <= 5))
    // second run: layouts already published → identical bytes
    val df = LlmOps.q244PqIndex(spark, sf)
    assert(df.collect().toSeq == a)
    // probe shape: the ONLY embeddings read is the bounded query
    // panel; candidates come from the 8-int code layout (the 64×
    // bandwidth cut), the codebook rides a broadcast
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embScans == 1,
      s"probe must scan raw vectors ONCE (the query panel): $embScans")
    assert(plan.contains("pqidx_") || plan.toLowerCase.contains("codes"),
      "probe must read the published code layout")
  }
}
