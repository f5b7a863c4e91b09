package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables._
import graft.ops.Splits

/** Corpus-management operators — dataset splitting and vocabulary
  * statistics, the bookkeeping half of a training-data pipeline (the
  * content half — dedup, quality, similarity — lives in LlmOps.scala).
  */
object Corpus {

  private val SplitCuts = Seq("train" -> 800L, "val" -> 900L, "test" -> 1000L)

  /** Deterministic 80/10/10 TRAIN/VAL/TEST split ([[graft.ops.Splits]]):
    * assignment is an affine hash of doc_id, so it is stable across runs,
    * engines, partition layouts, and re-ingestion — the property
    * `randomSplit` cannot give (its output depends on partition order,
    * so a repartition silently reshuffles the holdout). Audited per
    * (source, split): counts and char volume. Pure codegen'd column
    * arithmetic + one tiny agg shuffle.
    */
  def q53HashSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"),
        Splits.assign(col("doc_id"), SplitCuts).as("split"),
        col("n_chars"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("source", "split")

  val q53Oracle: String = {
    val b = Splits.bucketSql("doc_id")
    s"""SELECT source,
       |  CASE WHEN $b < 800 THEN 'train'
       |       WHEN $b < 900 THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM documents GROUP BY source, split ORDER BY source, split""".stripMargin
  }

  /** TF-IDF-style DISTINCTIVE TERMS per source — term frequency within
    * each source scored against corpus-wide document frequency, top 5
    * per source. The score is integer-scaled (`tf * 1e6 DIV df`) so
    * ranking is exact integer arithmetic in both engines — a float idf
    * (log) would differ in the last ulp across libm implementations.
    * Plan: ONE explode scan, aggregated twice — first to (term, source,
    * doc_id) occurrence counts, then to (term, source) carrying BOTH
    * tf (occurrences) and docs_st (documents in that source containing
    * the term). df is then a window `sum(docs_st) over (partition by
    * term)` — each doc lives in exactly one source, so the per-source
    * doc counts partition the corpus-wide document frequency. No tf⋈df
    * join exists at all: the corpus is read and exploded exactly once
    * (pinned in CorpusSpec — one scan, zero joins), and every exchange
    * after the first is vocabulary-sized, not corpus-sized, with partial
    * aggregation collapsing each term before any shuffle; a per-source
    * top-k window closes it out.
    */
  def q55Tfidf(s: SparkSession, d: String): DataFrame = {
    val st = documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("term", "source", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("term", "source")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("docs_st"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("term").asc)
    st.withColumn("df", sum(col("docs_st")).over(Window.partitionBy("term")))
      .withColumn("score", expr("tf * 1000000 DIV df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("source"), col("score").desc, col("term"))
  }

  val q55Oracle: String =
    """WITH terms AS (
      |  SELECT doc_id, source,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df
      |       FROM (SELECT DISTINCT term, doc_id FROM terms) GROUP BY 1),
      |scored AS (
      |  SELECT source, term, tf, df, tf * 1000000 // df AS score,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY tf * 1000000 // df DESC, term) AS rn
      |  FROM tf JOIN df USING (term))
      |SELECT source, term, tf, CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score
      |FROM scored WHERE rn <= 5 ORDER BY source, score DESC, term""".stripMargin
}
