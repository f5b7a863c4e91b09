package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q237 — the text-curation capstone's FUNNEL RECONCILIATION: the
  * ledger's stage removals must sum back to the corpus, each stage's
  * removals must be exactly the leg's own decisions applied to the
  * previous stage's survivors, and packing must conserve documents and
  * tokens (nothing lost or invented between the funnel and the bins).
  */
class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private lazy val ledger = LlmOps.q237TextCuration(spark, d)
    .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
    .collect()

  test("ledger identity: removals by each leg sum to the corpus, per source") {
    assert(ledger.nonEmpty)
    ledger.foreach { case (src, n, rmE, rmN, rmQ, rmM, kept, _, _, _) =>
      assert(rmE + rmN + rmQ + rmM + kept == n,
        s"$src: stage removals + kept must partition the source's docs")
    }
    val total = Tables.documents(spark, d).count()
    assert(ledger.map(_._2).sum == total, "ledger must cover every document")
  }

  test("stage attribution matches the legs' own decisions") {
    // exact leg: non-min doc per identical text (q26's distinct-content
    // semantics) — recomputed independently from raw text equality
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val rmExact = docs
      .withColumn("mn", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text")))
      .filter(col("doc_id") =!= col("mn"))
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    ledger.foreach { case (src, _, rmE, _, _, _, _, _, _, _) =>
      assert(rmE == rmExact.getOrElse(src, 0L),
        s"$src: exact-stage removals must equal raw-text duplicate count")
    }
    // near leg: the funnel's near removals are a SUBSET of q72's removal
    // set (q72 counts all cluster non-canonicals; the funnel bills those
    // already dropped as exact dups to stage 1), and per source the
    // funnel's count can never exceed the leg's
    val q72 = LlmOps.q72DedupPurge(spark, d)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    ledger.foreach { case (src, _, _, rmN, _, _, _, _, _, _) =>
      assert(rmN <= q72.getOrElse(src, 0L),
        s"$src: funnel near-dup removals cannot exceed the q72 leg's")
    }
    // across the corpus, exact+near removals together cover at least the
    // leg's full removal set (every cluster non-canonical is dropped by
    // stage 1 or stage 2 — attribution moves, the drop never vanishes)
    assert(ledger.map(r => r._3 + r._4).sum >= q72.values.sum)
  }

  test("stage-1 rides the WindowToAggJoin rewrite: no whole-partition Window in the plan") {
    val plan = LlmOps.q237TextCuration(spark, d).queryExecution.optimizedPlan
    val wholePartition = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.orderSpec.isEmpty => w
    }
    assert(wholePartition.isEmpty,
      s"stage-1 min(doc_id) OVER (PARTITION BY h) must be rewritten to " +
        s"agg+join; found: $wholePartition")
  }

  test("packing conserves documents and tokens across the funnel") {
    val totTok = ledger.map(_._9).sum
    // recompute survivors' token mass straight from the corpus through
    // the same leg rules (independent arithmetic: raw text, not ledger)
    val survTok = {
      val docs = Tables.documents(spark, d)
      val h = graft.functions.VectorExpressions.hornerHash(col("text"))
      val base = docs.select(col("doc_id"), col("source"), col("lang"),
        h.as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
      val keepExact = base
        .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      val removed = LlmOps.q63DedupClusters(spark, d)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"), lit(1).as("__rm"))
      keepExact
        .join(removed, Seq("doc_id"), "left")
        .join(LlmOps.qualityLogits(docs).select(col("doc_id"), col("logit")),
          Seq("doc_id"), "left")
        .filter(col("keep") && col("__rm").isNull &&
          coalesce(col("logit"), lit(0L)) >= 0 &&
          Corpus.mixtureKeepExpr(col("lang"), col("h")))
        .agg(coalesce(sum("ntok"), lit(0L))).as[Long].head()
    }
    assert(totTok == survTok,
      "packed token mass must equal the survivors' token mass exactly")
    // bins hold exactly the kept docs: sum over bins of n_docs == n_kept
    val packedDocs = Corpus.packedBins(
      Tables.documents(spark, d).limit(0)
        .select(col("source"), col("doc_id"), lit(0L).as("tok")))
    assert(packedDocs.columns.toSeq ==
      Seq("source", "bin", "n_docs", "n_tokens", "overflow"))
    ledger.foreach { case (src, _, _, _, _, _, kept, bins, tok, _) =>
      if (kept == 0) assert(bins == 0 && tok == 0,
        s"$src: empty survivors must pack to zero bins")
      else assert(bins >= 1 && bins <= kept,
        s"$src: bin count must lie between 1 and the kept-doc count")
    }
  }
}
