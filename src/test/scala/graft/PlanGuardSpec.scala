package graft

/** Fleet-wide scale-killer guard: walks EVERY registered query's physical
  * plan and fails if a nested-loop join (CartesianProduct /
  * BroadcastNestedLoopJoin) appears outside the explicit allowlist of
  * queries where the shape is intentional and bounded. A refactor that
  * silently degrades an equi-join into a nested loop — the classic
  * 100 TB catastrophe — now fails CI instead of surfacing in a bench
  * regression three rounds later.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries where a nested-loop operator is deliberate AND bounded. */
  private val intentional: Map[String, String] = Map(
    "q13_cross_join" -> "reference semantics: 25x5 dim cross join",
    "q24_cosine_topk" -> "broadcast of the single query vector (1 row)",
    "q43_quantized_topk" -> "broadcast of the single query vector (1 row)",
    "q106_ivf_recall" -> "broadcast of the query sample (hard-capped at RecallMaxQueries rows)",
    "q194_retrieval_metrics" -> "broadcast of the query sample (same doubly-bounded q106 panel)",
    "q195_ivf_sweep" -> "broadcast of the query sample (same doubly-bounded q106 panel)",
    "q28_ngram_jaccard" -> "all-pairs over an explicitly bounded candidate set (src0+en)",
    "q77_semantic_dedup" -> "broadcast of the corpus-proportional centroid set (argmax assignment needs all K per vector)",
    "q81_kmeans_step" -> "broadcast of the corpus-proportional centroid set (argmax assignment needs all K per vector)",
    "q85_heavy_hitters" -> "broadcast of the single-row corpus token total",
    "q112_maxsim" -> "broadcast of the bounded multi-vector query set (|MaxSimQLabels|*MaxSimQVecs rows)",
    "q115_hard_negatives" -> "broadcast of the corpus-proportional centroid set (argmax assignment needs all K per vector)",
    "q166_semantic_leak" -> "broadcast of the corpus-proportional centroid set (argmax assignment needs all K per vector)",
    "q130_join_card" -> "sketch attachment over 1-row-per-table aggregates (constant key folds away)",
    "q201_bigram_lm" -> "broadcast of the single-row train-token total (q85 discipline)",
    "q210_pq_adc" -> "broadcast of the query sample (same doubly-bounded q106 panel; exact ground-truth leg)",
    "q252_ivfadc_drift" -> "broadcast of the query sample (doubly-bounded q106 panel; exact ground-truth leg of the drift audit)",
    "q212_xmodal_metrics" -> "broadcast of the query sample (doubly-bounded image-kind panel)",
    "q216_diversity_sample" -> "broadcast of the corpus-proportional centroid set (argmax assignment needs all K per vector)",
    "q219_curation_ab" -> "broadcast of the single-row train-token totals, one per variant (q85/q201 discipline)")
  // q63 does not appear although it embeds a q28-shaped jaccard arm: its
  // query function RUNS the iterative component loop, so the returned
  // frame's plan reads the checkpointed labels — the edge-generation
  // plans are exercised (and guarded) through q28/q44 themselves.

  test("no unintentional nested-loop join in any registered physical plan") {
    val nestedByName = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan.toString
      name -> (plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"))
    }.toMap
    val offenders = nestedByName.collect {
      case (name, true) if !intentional.contains(name) => name
    }
    assert(offenders.isEmpty,
      s"nested-loop join leaked into: ${offenders.mkString(", ")}")
    // the allowlist must not go stale either: every entry really does
    // plan a (bounded, intentional) nested loop
    val stale = intentional.keys.filterNot(nestedByName.getOrElse(_, false))
    assert(stale.isEmpty, s"allowlist entries without a nested loop: $stale")
  }
}
