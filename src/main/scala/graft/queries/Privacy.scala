package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** PII scrubbing — the redaction pass every LLM training-data pipeline
  * runs before a corpus ships (emails, long account/phone digit runs).
  *
  * Regex subset is chosen to behave identically under Java regex (Spark)
  * and RE2 (DuckDB oracle): character classes, bounded/greedy repetition
  * and capture groups only — no lookaround (RE2 has none), no backrefs in
  * the PATTERN (only in the replacement, where both engines support group
  * references — `$1` in Java, `\1` in RE2).
  *
  * Scale: both passes are per-row `regexp_replace`/`regexp_count` column
  * expressions — fully inside whole-stage codegen, no UDF boxing, no
  * shuffle. At 100 TB this is a map-only scan whose cost is the regex
  * automaton over each document once.
  */
object Privacy {

  /** Anything shaped local@domain.tld (tld ≥ 2 alpha). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs of ≥9 — account-number shaped. The match consumes the
    * whole run (greedy `{5,}` + trailing capture of 4), so replacement
    * keeps only the last four digits: `123456789` → `***6789`. Runs of
    * ≤8 digits (years, small ids, quantities) are deliberately left.
    */
  val LongDigitRunRe = "[0-9]{5,}([0-9]{4})"

  /** Counting variant of [[LongDigitRunRe]] (no capture needed). */
  val LongDigitRunCountRe = "[0-9]{9,}"

  def redactEmails(c: Column): Column =
    regexp_replace(c, EmailRe, "[EMAIL]")

  def maskLongDigitRuns(c: Column): Column =
    regexp_replace(c, LongDigitRunRe, "***$1")

  /** customer through the maintained split layout — the redaction scan is
    * regex-CPU-bound; see [[graft.sources.Layouts]]. */
  private def customer(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.customer(s, d)

  /** documents through the maintained split layout — same contract as the
    * [[Corpus]]/[[LlmOps]] twins. */
  private def documents(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.documents(s, d)

  /** q64: end-to-end PII scrub. The fixture tables carry no free-form
    * contact text, so the contact line is synthesized DETERMINISTICALLY
    * from customer columns (name, key-derived email present on 2/3 of
    * rows, a 10-digit key-derived account number) — the redaction and
    * counting machinery under test is exactly what production would run
    * on scraped text, and the oracle builds the identical line in SQL.
    *
    * Counts are taken in pipeline order: emails on the raw line, digit
    * runs AFTER email redaction (an email's local part may itself be a
    * digit run — production pipelines count what each pass actually
    * removed, not overlapping raw matches).
    */
  def q64PiiRedact(s: SparkSession, d: String): DataFrame = {
    val acct = lpad(((col("c_custkey") * 7919L + 12345L) % 10000000000L)
      .cast("string"), 10, "0")
    val contact = when(col("c_custkey") % 3 === 0, lit("(none)"))
      .otherwise(concat(lit("user"), col("c_custkey").cast("string"),
        lit("@mail.example.com")))
    val raw = concat(
      lit("Reach "), col("c_name"), lit(" at "), contact,
      lit(", account "), acct, lit(", segment "), col("c_mktsegment"))
    val scrubbed = redactEmails(col("raw"))
    customer(s, d)
      .select(col("c_custkey"), raw.as("raw"))
      .select(
        col("c_custkey"),
        regexp_count(col("raw"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(scrubbed, lit(LongDigitRunCountRe)).cast("long").as("n_ids"),
        maskLongDigitRuns(scrubbed).as("redacted"))
      .orderBy("c_custkey")
  }

  val q64Oracle: String =
    """WITH raw AS (
      |  SELECT c_custkey,
      |    'Reach ' || c_name || ' at ' ||
      |    CASE WHEN c_custkey % 3 = 0 THEN '(none)'
      |         ELSE 'user' || CAST(c_custkey AS VARCHAR) || '@mail.example.com' END ||
      |    ', account ' ||
      |    lpad(CAST((c_custkey * 7919 + 12345) % 10000000000 AS VARCHAR), 10, '0') ||
      |    ', segment ' || c_mktsegment AS raw
      |  FROM customer),
      |e1 AS (
      |  SELECT c_custkey,
      |    CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
      |  FROM raw)
      |SELECT c_custkey, n_emails,
      |  CAST(len(regexp_extract_all(t1, '[0-9]{9,}')) AS BIGINT) AS n_ids,
      |  regexp_replace(t1, '[0-9]{5,}([0-9]{4})', '***\1', 'g') AS redacted
      |FROM e1 ORDER BY c_custkey""".stripMargin

  // --- k-anonymity audit (q138) -------------------------------------------

  /** q138 anonymity threshold and the length-generalization width (chars
    * per band). k=5 is the conventional floor for released datasets. */
  private val KAnon = 5L
  private val CharsBand = 256L

  /** q138: K-ANONYMITY AUDIT — the governance complement of q64's PII
    * redaction: scrubbing direct identifiers is not enough if
    * QUASI-identifiers (attributes an adversary can know from elsewhere)
    * isolate individuals. Here the QI tuple is (lang, source, document
    * length generalized to [[CharsBand]]-char bands — generalization IS
    * the k-anonymity mechanic); any QI group smaller than [[KAnon]] is
    * re-identifiable and its rows must be suppressed or further
    * generalized before release. Per (lang, source): group counts, the
    * suppressed mass in exact ppm, and the minimum group size (the
    * headline "this release is min_k-anonymous" number).
    *
    * Shape: one corpus scan → QI-group hash aggregate (domain-bounded:
    * |langs|·|sources|·|bands|), then a tiny rollup — the audit never
    * materializes row-level flags, so it runs at any corpus size; the
    * row-level suppression list is a semi-join of the corpus against the
    * small-group frame, deliberately NOT part of the audit plan.
    */
  def q138KAnonymity(s: SparkSession, d: String): DataFrame = {
    val groups = documents(s, d)
      .groupBy(col("lang"), col("source"),
        expr(s"n_chars DIV $CharsBand").as("len_band"))
      .agg(count(lit(1)).as("gsz"))
    groups.groupBy("lang", "source")
      .agg(sum(col("gsz")).as("n_docs"),
        count(lit(1)).as("n_qi_groups"),
        coalesce(sum(when(col("gsz") < KAnon, col("gsz"))), lit(0L))
          .as("n_suppressed"),
        min(col("gsz")).as("min_group_size"))
      .withColumn("suppressed_ppm",
        expr("n_suppressed * 1000000 DIV n_docs"))
      .orderBy("lang", "source")
  }

  val q138Oracle: String =
    s"""WITH g AS (
       |  SELECT lang, source, n_chars // $CharsBand AS len_band,
       |    count(*) AS gsz
       |  FROM documents GROUP BY 1, 2, 3)
       |SELECT lang, source,
       |  CAST(sum(gsz) AS BIGINT) AS n_docs,
       |  count(*) AS n_qi_groups,
       |  CAST(coalesce(sum(CASE WHEN gsz < $KAnon THEN gsz END), 0) AS BIGINT)
       |    AS n_suppressed,
       |  CAST(min(gsz) AS BIGINT) AS min_group_size,
       |  CAST(coalesce(sum(CASE WHEN gsz < $KAnon THEN gsz END), 0)
       |    * 1000000 // sum(gsz) AS BIGINT) AS suppressed_ppm
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- l-diversity audit (q148) -------------------------------------------

  /** q148: L-DIVERSITY AUDIT — the attribute-disclosure complement of
    * q138's k-anonymity: a QI group can be k-large yet still leak if
    * every member shares the same SENSITIVE value (the classic
    * homogeneity attack — "all 12 patients in that ZIP+age cell have
    * the same diagnosis"). Here the QI tuple is (lang, length band —
    * q138's generalization) and the sensitive attribute is `source`
    * (which crawl/provider a document came from — exactly what a
    * release would withhold). Per lang: the worst-case distinct-l
    * (min distinct sources over its QI groups), the homogeneous-group
    * count and its row mass in exact ppm, and the corpus-worst
    * single-source share inside any group (max top-share, the
    * probabilistic-inference bound on P[sensitive|QI]) — every figure
    * an exact integer, nothing rank-ordered, so no tie rule needed.
    *
    * Shape: one corpus scan → (lang, band, source) counts
    * (domain-bounded, map-side combinable), a second domain-sized
    * rollup to QI groups, then a |langs|-row audit frame. Row-level
    * remediation (suppress/generalize homogeneous groups) is a
    * semi-join against the small QI frame, deliberately not part of
    * the audit plan — same discipline as q138.
    */
  def q148LDiversity(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy(col("lang"), expr(s"n_chars DIV $CharsBand").as("len_band"),
        col("source"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy("lang", "len_band")
      .agg(sum(col("c")).as("gsz"), count(lit(1)).as("ndist"),
        max(col("c")).as("topc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_qi_groups"),
        sum(col("gsz")).as("n_docs"),
        min(col("ndist")).as("min_l"),
        sum(when(col("ndist") === 1, 1L).otherwise(0L))
          .as("n_homogeneous"),
        coalesce(sum(when(col("ndist") === 1, col("gsz"))), lit(0L))
          .as("homogeneous_docs"),
        max(expr("topc * 1000000 DIV gsz")).as("max_top_share_ppm"))
      .withColumn("homogeneous_ppm",
        expr("homogeneous_docs * 1000000 DIV n_docs"))
      .select(col("lang"), col("n_qi_groups"), col("n_docs"), col("min_l"),
        col("n_homogeneous"), col("homogeneous_ppm"),
        col("max_top_share_ppm"))
      .orderBy("lang")
  }

  val q148Oracle: String =
    s"""WITH cells AS (
       |  SELECT lang, n_chars // $CharsBand AS len_band, source,
       |    count(*) AS c
       |  FROM documents GROUP BY 1, 2, 3),
       |qi AS (
       |  SELECT lang, len_band, sum(c) AS gsz, count(*) AS ndist,
       |    max(c) AS topc
       |  FROM cells GROUP BY 1, 2)
       |SELECT lang, count(*) AS n_qi_groups,
       |  CAST(sum(gsz) AS BIGINT) AS n_docs,
       |  CAST(min(ndist) AS BIGINT) AS min_l,
       |  CAST(sum(CASE WHEN ndist = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_homogeneous,
       |  CAST(coalesce(sum(CASE WHEN ndist = 1 THEN gsz END), 0)
       |    * 1000000 // sum(gsz) AS BIGINT) AS homogeneous_ppm,
       |  CAST(max(topc * 1000000 // gsz) AS BIGINT) AS max_top_share_ppm
       |FROM qi GROUP BY lang ORDER BY lang""".stripMargin

  // --- Right-to-be-forgotten impact plan (q187) ----------------------------

  /** q187: FORGET PLAN — the deletion-impact report a GDPR/CCPA erasure
    * batch produces BEFORE it runs: for a deterministic DSR cohort
    * (user_id / custkey ≡ 0 mod 97 plays the request batch), the rows to
    * purge per table INCLUDING the referential cascade — lineitem rows
    * die because their parent order dies, which a naive per-table
    * user-column scan would miss entirely. q64 redacts content, q138/
    * q148 audit re-identifiability; this is the third governance leg:
    * erasure scoping. Per table: purge count, total, share in ppm.
    *
    * Scale shape: each table scanned once — the purge-flagged orders
    * frame (key + flag, a 2-column projection) is materialized eagerly
    * (localCheckpoint) and feeds BOTH its own report row and the
    * lineitem cascade, instead of re-scanning orders per consumer; the
    * cascade is one orderkey-partitioned equi-join (orders-to-purge →
    * lineitem); the four single-row aggregates union into the 4-row
    * report. A real deployment swaps the mod-97 predicate for a keyset
    * broadcast — the plan shape is identical.
    */
  def q187ForgetPlan(s: SparkSession, d: String): DataFrame = {
    def report(name: String, purge: Column, df: DataFrame): DataFrame =
      df.agg(count(when(purge, 1)).as("n_purge"), count(lit(1)).as("n_total"))
        .select(lit(name).as("table_name"), col("n_purge"), col("n_total"),
          expr("n_purge * 1000000 DIV n_total").as("share_ppm"))
    val flagged = orders(s, d)
      .select(col("o_orderkey"), (col("o_custkey") % 97 === 0).as("purge"))
      .localCheckpoint(eager = true)
    val ev = report("events", col("user_id") % 97 === 0, events(s, d))
    val cu = report("customer", col("c_custkey") % 97 === 0, customer(s, d))
    val or_ = report("orders", col("purge"), flagged)
    val li = report("lineitem", col("purge"),
      lineitem(s, d).select(col("l_orderkey"))
        .join(flagged.select(col("o_orderkey").as("l_orderkey"),
          col("purge")), Seq("l_orderkey")))
    cu.unionByName(ev).unionByName(li).unionByName(or_)
      .orderBy("table_name")
  }

  val q187Oracle: String =
    """WITH c AS (
      |  SELECT 'customer' AS table_name,
      |    count_if(c_custkey % 97 = 0) AS n_purge, count(*) AS n_total
      |  FROM customer),
      |e AS (
      |  SELECT 'events', count_if(user_id % 97 = 0), count(*) FROM events),
      |o AS (
      |  SELECT 'orders', count_if(o_custkey % 97 = 0), count(*)
      |  FROM orders),
      |l AS (
      |  SELECT 'lineitem', count_if(oo.o_custkey % 97 = 0), count(*)
      |  FROM lineitem ll JOIN orders oo ON oo.o_orderkey = ll.l_orderkey),
      |u AS (
      |  SELECT * FROM c UNION ALL SELECT * FROM e
      |  UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l)
      |SELECT table_name, CAST(n_purge AS BIGINT) AS n_purge,
      |  n_total, CAST(n_purge * 1000000 // n_total AS BIGINT) AS share_ppm
      |FROM u ORDER BY table_name""".stripMargin
}
