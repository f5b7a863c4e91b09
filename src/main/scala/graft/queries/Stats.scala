package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables._

/** Distribution-level statistical audits — the third ring of the
  * time-series/statistics family started by q141–q143: rank correlation
  * (q144), concentration/inequality (q145), and serial dependence
  * (q146). Every statistic is computed from EXACT integer/decimal
  * moments so Spark and the DuckDB oracle emit identical values; the
  * only doubles are final `round(x, 6)` presentations of exact-moment
  * ratios (the q10 discipline — rounding at 1e-6 absorbs the ~1e-15
  * relative float noise of the division/sqrt).
  *
  * Scale shape shared by all three: one corpus-sized aggregate down to a
  * DOMAIN-sized frame (value histogram / day grid), then windows and
  * joins ride that tiny frame only. No corpus-sized sort anywhere.
  */
object Stats {

  /** events through the maintained split layout
    * ([[graft.sources.Layouts]]) — same rows past the ts adaptation,
    * splittable files for the scans here. */
  private def events(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.events(s, d)

  private def big(c: Column): Column = c.cast("decimal(38,0)")

  // --- Exact Spearman rank correlation (q144) -----------------------------

  /** q144: EXACT SPEARMAN RANK CORRELATION with tie-aware AVERAGE ranks —
    * the monotone-association complement of q10's Pearson: "does discount
    * depth track order size at all, linearly or not". Both variables here
    * (l_quantity 1–50, discount cents 0–10) are massively tied, so the
    * naive `6Σd²/(n(n²−1))` shortcut is WRONG (it assumes distinct
    * ranks); the correct estimator is Pearson over average ranks, and
    * average ranks are where engines diverge (float rank means). This
    * implementation never materializes a per-row rank: ranks are DOUBLED
    * to stay integral (`rx2 = 2·|{x'<x}| + c(x) + 1` — twice the average
    * rank of a tie block, exact), then CENTERED (`dx = rx2 − (n+1)`,
    * Σ c·dx = 0 by construction) so the co-moment sums stay within
    * decimal(38,0) at any n where Σ c·dx·dy ≤ n³ holds — n ≲ 10¹²
    * rows per group (uncentered double-rank moments overflow at ~3e8).
    *
    * Scale shape: ONE corpus scan to the (group, x, y) pair-count frame
    * (≤ 50·11 rows per group — map-side combinable), marginal histograms
    * and their cumulative windows ride that frame, and the rank joins
    * are domain-sized. A sort-based `rank()` over the raw rows would
    * shuffle AND sort the corpus per variable; this shape sorts ≤ 550
    * rows per group. Final ρ = Σc·dx·dy / √(Σc·dx²)·√(Σc·dy²) rounded
    * to 6 places from exact moments.
    */
  def q144Spearman(s: SparkSession, d: String): DataFrame = {
    val pairs = lineitem(s, d)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_discount") * 100, 0).cast("long").as("y"))
      .groupBy("g", "x", "y").agg(count(lit(1)).as("c"))
    val wG = Window.partitionBy("g")
    def rank2(v: String): DataFrame = {
      val h = pairs.groupBy(col("g"), col(v))
        .agg(sum(col("c")).as("cv"))
      val wCum = Window.partitionBy("g").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cumb", coalesce(sum(col("cv")).over(wCum), lit(0L)))
        .select(col("g"), col(v),
          (lit(2) * col("cumb") + col("cv") + 1).as(s"r2$v"),
          col("cv").as(s"cv$v"))
    }
    pairs
      .join(rank2("x"), Seq("g", "x"))
      .join(rank2("y"), Seq("g", "y"))
      .withColumn("n", sum(col("c")).over(wG))
      .withColumn("dx", big(col("r2x") - (col("n") + 1)))
      .withColumn("dy", big(col("r2y") - (col("n") + 1)))
      .groupBy("g")
      .agg(max(col("n")).as("n"),
        big(sum(col("c") * col("dx") * col("dy"))).as("sxy"),
        big(sum(col("c") * col("dx") * col("dx"))).as("sxx"),
        big(sum(col("c") * col("dy") * col("dy"))).as("syy"),
        countDistinct(col("x")).as("n_x_levels"),
        countDistinct(col("y")).as("n_y_levels"))
      .select(col("g").as("l_returnflag"), col("n").as("n_rows"),
        col("n_x_levels"), col("n_y_levels"),
        round(col("sxy") / (sqrt(col("sxx")) * sqrt(col("syy"))), 6)
          .as("rho_spearman"))
      .orderBy("l_returnflag")
  }

  val q144Oracle: String =
    """WITH pairs AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_discount * 100) AS BIGINT) AS y, count(*) AS c
      |  FROM lineitem GROUP BY 1, 2, 3),
      |hx AS (
      |  SELECT g, x, sum(c) AS cv,
      |    coalesce(sum(sum(c)) OVER (PARTITION BY g ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM pairs GROUP BY 1, 2),
      |hy AS (
      |  SELECT g, y, sum(c) AS cv,
      |    coalesce(sum(sum(c)) OVER (PARTITION BY g ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM pairs GROUP BY 1, 2),
      |j AS (
      |  SELECT p.g, p.c,
      |    sum(p.c) OVER (PARTITION BY p.g) AS n,
      |    2 * hx.cumb + hx.cv + 1 AS r2x,
      |    2 * hy.cumb + hy.cv + 1 AS r2y,
      |    p.x, p.y
      |  FROM pairs p
      |  JOIN hx ON hx.g = p.g AND hx.x = p.x
      |  JOIN hy ON hy.g = p.g AND hy.y = p.y),
      |m AS (
      |  SELECT g, max(n) AS n,
      |    sum(CAST(c AS HUGEINT) * (r2x - (n + 1)) * (r2y - (n + 1))) AS sxy,
      |    sum(CAST(c AS HUGEINT) * (r2x - (n + 1)) * (r2x - (n + 1))) AS sxx,
      |    sum(CAST(c AS HUGEINT) * (r2y - (n + 1)) * (r2y - (n + 1))) AS syy,
      |    count(DISTINCT x) AS n_x_levels, count(DISTINCT y) AS n_y_levels
      |  FROM j GROUP BY g)
      |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  n_x_levels, n_y_levels,
      |  round(CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) *
      |    sqrt(CAST(syy AS DOUBLE))), 6) AS rho_spearman
      |FROM m ORDER BY l_returnflag""".stripMargin

  // --- Activity concentration: Gini + top-decile share (q145) -------------

  /** q145: ACTIVITY CONCENTRATION — exact Gini coefficient and top-decile
    * share of per-user event volume, per event_type: "is this traffic a
    * broad base or five whales", the audit that decides whether per-user
    * quotas (q93) or skew handling (q117) are load-bearing. Gini comes
    * from the sorted-rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx);
    * the rank-weighted sum is TIE-INVARIANT (equal x within a tie block
    * contribute Σi·x regardless of internal order), so it is computed
    * from the activity-count HISTOGRAM without ever ranking users:
    * a block of m users at activity v starting after `cumb` smaller
    * users contributes v·(m·cumb + m(m+1)/2). Top-decile share walks the
    * same histogram from the top, taking `min(m, k − taken)` users per
    * block (k = n div 10; the straddling block is split exactly).
    *
    * Scale shape: per-user counts (user-keyed aggregate, map-side
    * combinable) collapse to the (type, activity-count) histogram —
    * ≤ a few hundred distinct activity levels at ANY corpus size — and
    * both windows ride that tiny frame. All ppm figures are exact
    * integer divisions; n·T ≤ 10¹¹·10¹⁶ fits decimal(38,0).
    */
  def q145Gini(s: SparkSession, d: String): DataFrame = {
    val hist = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("v"))
      .groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("m"))
    val wT = Window.partitionBy("event_type")
    val wAsc = wT.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = wT.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("n", sum(col("m")).over(wT))
      .withColumn("t", sum(col("v") * col("m")).over(wT))
      .withColumn("cumb", coalesce(sum(col("m")).over(wAsc), lit(0L)))
      .withColumn("above", coalesce(sum(col("m")).over(wDesc), lit(0L)))
      .withColumn("k", expr("n DIV 10"))
      .withColumn("take",
        greatest(lit(0L), least(col("m"), col("k") - col("above"))))
      // m(m+1)/2 with the even factor halved BEFORE the decimal multiply:
      // a decimal `DIV 2` would coerce the quotient to long (overflow at
      // m ~ 4e9) and a decimal `/ 2` drags in a fractional scale.
      .withColumn("halfblk",
        when(col("m") % 2 === 0, big(expr("m DIV 2")) * (big(col("m")) + 1))
          .otherwise(big(col("m")) * big(expr("(m + 1) DIV 2"))))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_users"), max(col("t")).as("n_events"),
        big(sum(big(col("v")) *
          (big(col("m")) * big(col("cumb")) + col("halfblk")))).as("s"),
        sum(col("take") * col("v")).as("topk"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        expr("(2 * s - (CAST(n_users AS DECIMAL(38,0)) + 1) * n_events)" +
          " * 1000000 DIV (CAST(n_users AS DECIMAL(38,0)) * n_events)")
          .cast("long").as("gini_ppm"),
        expr("topk * 1000000 DIV n_events").cast("long")
          .as("top_decile_share_ppm"))
      .orderBy("event_type")
  }

  val q145Oracle: String =
    """WITH ua AS (
      |  SELECT event_type, user_id, count(*) AS v
      |  FROM events GROUP BY 1, 2),
      |hist AS (
      |  SELECT event_type, v, count(*) AS m FROM ua GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, v, m,
      |    sum(m) OVER (PARTITION BY event_type) AS n,
      |    sum(v * m) OVER (PARTITION BY event_type) AS t,
      |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
      |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      |  FROM hist),
      |f AS (
      |  SELECT event_type, max(n) AS n, max(t) AS t,
      |    sum(CAST(v AS HUGEINT) * (CAST(m AS HUGEINT) * cumb
      |      + m * (m + 1) // 2)) AS s,
      |    sum(greatest(0, least(m, n // 10 - above)) * v) AS topk
      |  FROM w GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_users,
      |  CAST(t AS BIGINT) AS n_events,
      |  CAST((2 * s - (CAST(n AS HUGEINT) + 1) * t) * 1000000
      |    // (CAST(n AS HUGEINT) * t) AS BIGINT) AS gini_ppm,
      |  CAST(topk * 1000000 // t AS BIGINT) AS top_decile_share_ppm
      |FROM f ORDER BY event_type""".stripMargin

  // --- Lag-1 autocorrelation of daily totals (q146) -----------------------

  /** q146: LAG-1 AUTOCORRELATION of daily revenue totals per event_type —
    * the serial-dependence audit that closes the q141–q143 family:
    * trend (q141) says "drifting", CUSUM (q143) says "shifted once",
    * autocorrelation says "momentum vs mean-reversion" — the statistic
    * that decides whether yesterday predicts today (and whether naive
    * day-over-day alerts will double-fire). The estimator is
    * r₁ = Σₜ(xₜ−x̄)(xₜ₋₁−x̄) / Σₜ(xₜ−x̄)², computed WITHOUT the
    * fractional mean by multiplying through by n²:
    * N = n²P − nG(H+Q) + (n−1)G², D = n²Sxx − nG², where P = Σ xₜxₜ₋₁,
    * H/Q are the tail/head sums over adjacent pairs and G, Sxx the plain
    * first/second moments. Division is sign-factored
    * (`sign·(|N|·10⁶ div D)`) for the Spark-truncates/DuckDB-floors
    * mismatch on negative autocorrelation (q141 discipline). Lag pairs
    * are OBSERVED-consecutive (gap days pair across the gap) — the
    * engine-neutral choice that needs no spine join; documented, and the
    * fixture has no gaps. Bounds: n ≤ 10⁴ days, G ≤ 10¹⁶ cents →
    * n²Sxx ≲ 10³⁶, inside decimal(38,0)/HUGEINT.
    *
    * Scale shape: one event-sized aggregate to the (type, day) frame;
    * the lag window, moments, and division all ride that day-granularity
    * frame. Degenerate groups (n < 2 or zero variance) emit NULL, not a
    * fabricated 0.
    */
  def q146Autocorr(s: SparkSession, d: String): DataFrame = {
    val wLag = Window.partitionBy("event_type").orderBy("day")
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .withColumn("xp", lag(col("x"), 1).over(wLag))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        big(sum(col("x"))).as("g"),
        big(sum(big(col("x")) * big(col("x")))).as("sxx"),
        big(sum(big(col("x")) * big(col("xp")))).as("p"),
        big(sum(when(col("xp").isNotNull, col("x")))).as("h"),
        big(sum(col("xp"))).as("q"))
      .withColumn("nn", big(col("n_days")))
      .withColumn("num",
        col("nn") * col("nn") * col("p")
          - col("nn") * col("g") * (col("h") + col("q"))
          + (col("nn") - 1) * col("g") * col("g"))
      .withColumn("den",
        col("nn") * col("nn") * col("sxx") - col("nn") * col("g") * col("g"))
      .select(col("event_type"), col("n_days"),
        expr("CASE WHEN n_days >= 2 AND den > 0 THEN " +
          "CAST(sign(num) AS DECIMAL(38,0)) * (abs(num) * 1000000 DIV den)" +
          " END").cast("long").as("r1_ppm"))
      .orderBy("event_type")
  }

  val q146Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS x
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, x,
      |    lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
      |  FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS g,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * xp) AS p,
      |    sum(CASE WHEN xp IS NOT NULL THEN CAST(x AS HUGEINT) END) AS h,
      |    sum(CAST(xp AS HUGEINT)) AS q
      |  FROM l GROUP BY 1),
      |f AS (
      |  SELECT event_type, n,
      |    n * n * p - n * g * (h + q) + (n - 1) * g * g AS num,
      |    n * n * sxx - n * g * g AS den
      |  FROM m)
      |SELECT event_type, n AS n_days,
      |  CAST(CASE WHEN n >= 2 AND den > 0 THEN
      |    sign(num) * (abs(num) * 1000000 // den) END AS BIGINT) AS r1_ppm
      |FROM f ORDER BY event_type""".stripMargin

  // --- Benford first-digit audit (q147) -----------------------------------

  /** Benford expected first-digit frequencies, ppm: round(log10(1+1/d)·10⁶).
    * HARD-CODED so neither engine evaluates a libm log10 (whose last-ulp
    * could differ across platforms); the nine constants sum to exactly
    * 1 000 000. */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** q147: BENFORD FIRST-DIGIT AUDIT — the fabricated-data / broken-feed
    * detector: organically-grown monetary amounts follow Benford's law
    * (P(first digit = d) = log10(1+1/d)); synthetic fills, unit bugs and
    * truncated extracts don't. Per o_orderpriority, the observed
    * first-digit distribution of o_totalprice (cents) against the
    * hard-coded expected ppm ([[BenfordPpm]] — constants, never a
    * runtime log10), with the signed deviation per digit. The first
    * digit is taken from the DECIMAL STRING of the positive integer
    * cents — `substr(cast(cents), 1, 1)` is engine-identical, where a
    * log10-and-divide extraction would be another float hazard.
    *
    * The audit emits all 9 digit rows per group even when a digit never
    * occurs (observed_ppm = 0): a MISSING leading digit is the loudest
    * possible Benford violation, and an inner-grouped frame would
    * silently drop it. Rather than cross-joining a digit spine against
    * the group domain (whose naive form re-scans orders to discover the
    * groups), each group's digit counts collapse to ONE row holding a
    * 9-entry digit→count map, and the constant (digit, expected) spine
    * explodes back out of a literal — one scan, no spine join, no
    * reliance on exchange reuse.
    *
    * Scale shape: one orders scan → (priority, digit) counts (map-side
    * combinable, ≤ 9·|priorities| rows); everything after is the
    * |priorities|-row frame.
    */
  def q147Benford(s: SparkSession, d: String): DataFrame = {
    val spine = expr("explode(array(" + BenfordPpm
      .map { case (dg, p) => s"struct(CAST($dg AS BIGINT) AS digit, " +
        s"CAST($p AS BIGINT) AS expected_ppm)" }
      .mkString(", ") + "))")
    orders(s, d)
      .select(col("o_orderpriority").as("g"),
        substring(round(col("o_totalprice") * 100, 0).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("g", "digit").agg(count(lit(1)).as("c"))
      .groupBy("g")
      .agg(map_from_entries(collect_list(struct(col("digit"), col("c"))))
        .as("m"), sum(col("c")).as("n"))
      .select(col("g"), col("m"), col("n"), spine.as("bf"))
      .select(col("g").as("o_orderpriority"), col("bf.digit").as("digit"),
        coalesce(expr("element_at(m, bf.digit)"), lit(0L)).as("n_orders"),
        col("n"), col("bf.expected_ppm").as("expected_ppm"))
      .withColumn("observed_ppm", expr("n_orders * 1000000 DIV n"))
      .select(col("o_orderpriority"), col("digit"), col("n_orders"),
        col("observed_ppm"), col("expected_ppm"),
        (col("observed_ppm") - col("expected_ppm")).as("dev_ppm"))
      .orderBy("o_orderpriority", "digit")
  }

  val q147Oracle: String = {
    val expected = BenfordPpm
      .map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
    s"""WITH counts AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    count(*) AS c
       |  FROM orders GROUP BY 1, 2),
       |bf(digit, expected_ppm) AS (VALUES $expected),
       |spine AS (
       |  SELECT g, CAST(bf.digit AS BIGINT) AS digit,
       |    CAST(bf.expected_ppm AS BIGINT) AS expected_ppm
       |  FROM (SELECT DISTINCT g FROM counts) CROSS JOIN bf),
       |j AS (
       |  SELECT s.g, s.digit, s.expected_ppm, coalesce(c.c, 0) AS c
       |  FROM spine s LEFT JOIN counts c ON c.g = s.g AND c.digit = s.digit),
       |w AS (
       |  SELECT g, digit, expected_ppm, c,
       |    sum(c) OVER (PARTITION BY g) AS n
       |  FROM j)
       |SELECT g AS o_orderpriority, digit, CAST(c AS BIGINT) AS n_orders,
       |  CAST(c * 1000000 // n AS BIGINT) AS observed_ppm, expected_ppm,
       |  CAST(c * 1000000 // n - expected_ppm AS BIGINT) AS dev_ppm
       |FROM w ORDER BY o_orderpriority, digit""".stripMargin
  }

  // --- Two-sample Kolmogorov–Smirnov drift (q149) -------------------------

  /** q149: TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT — the CDF-space
    * complement of q129's total-variation drift: TV sums pointwise mass
    * differences (sensitive to reshuffling WITHIN the distribution), KS
    * takes the maximum CDF gap (sensitive to location/scale SHIFT, the
    * signature of a unit change or a population mix change). Per
    * event_type, the exact KS statistic between the value (cents)
    * distributions of the deterministic user_id-parity halves (the
    * operator is the comparison; the slicing stands in for consecutive
    * snapshots, q129 discipline), plus WHERE the maximum gap sits — the
    * split value is the actionable part of a KS alarm ("everything
    * above $X doubled"). Ties break to the SMALLEST cents on both
    * engines.
    *
    * Exactness: D = max |F_a − F_b| is cross-multiplied to integers —
    * |cum_a·N_b − cum_b·N_a| over N_a·N_b (decimal(38,0)/HUGEINT:
    * cum·N ≈ 10¹²·10¹² = 10²⁴) → exact ppm; no per-engine float CDF.
    *
    * Scale shape: one corpus scan → (type, cents) histogram with one
    * CONDITIONAL count per side (nothing wider than two longs per
    * distinct value moves through the shuffle); cumulative windows and
    * the argmax rank ride the value-domain frame — bounded by the cents
    * grid, never the row count.
    */
  def q149KsDrift(s: SparkSession, d: String): DataFrame = {
    val wT = Window.partitionBy("event_type")
    val wCum = wT.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("user_id") % 2 === 0).as("a"))
      .groupBy("event_type", "cents")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      .withColumn("na", sum(col("ca")).over(wT))
      .withColumn("nb", sum(col("cb")).over(wT))
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("gap",
        abs(big(col("cuma")) * big(col("nb"))
          - big(col("cumb")) * big(col("na"))))
      .withColumn("rn",
        row_number().over(wT.orderBy(col("gap").desc, col("cents"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
        expr("gap * 1000000 DIV (CAST(na AS DECIMAL(38,0)) * nb)")
          .cast("long").as("ks_ppm"),
        col("cents").as("split_cents"))
      .orderBy("event_type")
  }

  val q149Oracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS cb
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, cents,
      |    sum(ca) OVER (PARTITION BY event_type) AS na,
      |    sum(cb) OVER (PARTITION BY event_type) AS nb,
      |    sum(ca) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM h),
      |g AS (
      |  SELECT event_type, cents, na, nb,
      |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
      |      AS gap,
      |    row_number() OVER (PARTITION BY event_type ORDER BY
      |      abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
      |        DESC, cents) AS rn
      |  FROM w)
      |SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(gap * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
      |    AS ks_ppm,
      |  cents AS split_cents
      |FROM g WHERE rn = 1 ORDER BY event_type""".stripMargin

  // --- Exact trimmed & winsorized means (q153) ----------------------------

  /** q153: TRIMMED AND WINSORIZED MEANS — the robust location estimators
    * between q03's plain mean (outlier-hostage) and q134's median
    * (discards all magnitude information): trim DROPS the extreme 5%
    * per tail, winsorize CLAMPS them to the surviving boundary values —
    * the standard treatment before averaging monetary columns that mix
    * organic traffic with test records and fat-finger amounts. Both are
    * order statistics, so the engine-portability problem is the same as
    * q50's quartiles and solved the same way: from the (type, cents)
    * COUNT HISTOGRAM, never a per-group sorted buffer. k = n div 20
    * rows come off each tail by cumulative walk with the straddling
    * block SPLIT EXACTLY (take = clamp(k − cum_before) per block, the
    * q145 decile discipline); the winsorizing boundaries are the values
    * at ranks k+1 and n−k (min/max surviving value, from the same
    * cumulative frame — no second pass). All sums exact longs-in-
    * decimal; means emitted in milli-cents via integer division.
    *
    * Scale shape: one events scan → (type, cents) histogram (map-side
    * combinable, value-domain-bounded); two cumulative windows and the
    * boundary lookups ride that frame; final rollup is |types| rows.
    */
  def q153TrimmedMean(s: SparkSession, d: String): DataFrame = {
    val wT = Window.partitionBy("event_type")
    val wAsc = wT.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = wT.orderBy(col("cents").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("m"))
      .withColumn("n", sum(col("m")).over(wT))
      .withColumn("t", sum(col("cents") * col("m")).over(wT))
      .withColumn("k", expr("n DIV 20"))
      .withColumn("cumb", coalesce(sum(col("m")).over(wAsc), lit(0L)))
      .withColumn("cuma", coalesce(sum(col("m")).over(wDesc), lit(0L)))
      .withColumn("take_lo",
        greatest(lit(0L), least(col("m"), col("k") - col("cumb"))))
      .withColumn("take_hi",
        greatest(lit(0L), least(col("m"), col("k") - col("cuma"))))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_events"), max(col("t")).as("sum_cents"),
        max(col("k")).as("k_trimmed"),
        sum(col("take_lo") * col("cents")).as("lo_sum"),
        sum(col("take_hi") * col("cents")).as("hi_sum"),
        min(when(col("cumb") + col("m") > col("k"), col("cents")))
          .as("lo_kept"),
        max(when(col("cuma") + col("m") > col("k"), col("cents")))
          .as("hi_kept"))
      .select(col("event_type"), col("n_events"), col("k_trimmed"),
        col("lo_kept"), col("hi_kept"),
        expr("(sum_cents - lo_sum - hi_sum) * 1000 DIV " +
          "(n_events - 2 * k_trimmed)").as("trimmed_mean_mcents"),
        expr("(sum_cents - lo_sum - hi_sum + k_trimmed * lo_kept" +
          " + k_trimmed * hi_kept) * 1000 DIV n_events")
          .as("winsorized_mean_mcents"),
        expr("sum_cents * 1000 DIV n_events").as("raw_mean_mcents"))
      .orderBy("event_type")
  }

  val q153Oracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    count(*) AS m
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, cents, m,
      |    sum(m) OVER (PARTITION BY event_type) AS n,
      |    sum(cents * m) OVER (PARTITION BY event_type) AS t,
      |    sum(m) OVER (PARTITION BY event_type) // 20 AS k,
      |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
      |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY cents DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cuma
      |  FROM h),
      |f AS (
      |  SELECT event_type, max(n) AS n, max(t) AS t, max(k) AS k,
      |    sum(greatest(0, least(m, k - cumb)) * cents) AS lo_sum,
      |    sum(greatest(0, least(m, k - cuma)) * cents) AS hi_sum,
      |    min(CASE WHEN cumb + m > k THEN cents END) AS lo_kept,
      |    max(CASE WHEN cuma + m > k THEN cents END) AS hi_kept
      |  FROM w GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_events,
      |  CAST(k AS BIGINT) AS k_trimmed,
      |  lo_kept, hi_kept,
      |  CAST((t - lo_sum - hi_sum) * 1000 // (n - 2 * k) AS BIGINT)
      |    AS trimmed_mean_mcents,
      |  CAST((t - lo_sum - hi_sum + k * lo_kept + k * hi_kept) * 1000
      |    // n AS BIGINT) AS winsorized_mean_mcents,
      |  CAST(t * 1000 // n AS BIGINT) AS raw_mean_mcents
      |FROM f ORDER BY event_type""".stripMargin

  // --- Quantile-quantile displacement table (q154) ------------------------

  /** q154: Q–Q DISPLACEMENT TABLE — the full-profile complement of
    * q149's KS statistic: KS reports the single worst CDF gap, the Q–Q
    * table reports WHERE the whole distribution moved — per event_type,
    * the exact decile values (p = 10..90) of the two user-parity slices
    * side by side with their signed displacement in cents ("slice B's
    * median is 340 cents higher, but its p90 is unchanged" — the shape
    * of a drift, not just its size). Quantiles are TYPE-1 (value at
    * rank ⌈p·n/100⌉ = (p·n+99) div 100 — pure integer, no
    * interpolation), so every figure is exact and the displacement is a
    * plain difference — no division, hence no truncate-vs-floor hazard
    * even on negative shifts.
    *
    * Scale shape: the same (type, cents) conditional histogram as q149
    * (one scan, two longs per distinct value through the shuffle);
    * cumulative windows ride the value-domain frame; each of the 9
    * decile thresholds is resolved as min(v | cum ≥ rank) — a 9-way
    * literal explode of the domain frame, then a tiny (type, p) rollup.
    * Never a per-group sorted buffer, never a corpus-sized sort.
    */
  def q154QqTable(s: SparkSession, d: String): DataFrame = {
    val wT = Window.partitionBy("event_type")
    val wCum = wT.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = events(s, d)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("user_id") % 2 === 0).as("a"))
      .groupBy("event_type", "cents")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      .withColumn("na", sum(col("ca")).over(wT))
      .withColumn("nb", sum(col("cb")).over(wT))
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("p", explode(expr(
        "array(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L)")))
    def side(cum: String, n: String): Column =
      min(when(col(cum) >= expr(s"(p * $n + 99) DIV 100"), col("cents")))
    hist.groupBy("event_type", "p")
      .agg(side("cuma", "na").as("q_a_cents"),
        side("cumb", "nb").as("q_b_cents"))
      .withColumn("shift_cents", col("q_b_cents") - col("q_a_cents"))
      .orderBy("event_type", "p")
  }

  val q154Oracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS cb
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, cents,
      |    sum(ca) OVER (PARTITION BY event_type) AS na,
      |    sum(cb) OVER (PARTITION BY event_type) AS nb,
      |    sum(ca) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM h),
      |x AS (
      |  SELECT w.*, p.p
      |  FROM w CROSS JOIN (VALUES (10), (20), (30), (40), (50), (60),
      |    (70), (80), (90)) p(p))
      |SELECT event_type, CAST(p AS BIGINT) AS p,
      |  min(CASE WHEN cuma >= (p * na + 99) // 100 THEN cents END)
      |    AS q_a_cents,
      |  min(CASE WHEN cumb >= (p * nb + 99) // 100 THEN cents END)
      |    AS q_b_cents,
      |  min(CASE WHEN cumb >= (p * nb + 99) // 100 THEN cents END)
      |    - min(CASE WHEN cuma >= (p * na + 99) // 100 THEN cents END)
      |    AS shift_cents
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- Activity decile lift table (q155) ----------------------------------

  /** q155: DECILE LIFT TABLE — the full Lorenz curve behind q145's two
    * scalars (Gini + top-decile): users ranked by activity, cut into 10
    * exact deciles (most-active first), each row reporting its exact
    * user count, event share, and cumulative share in ppm — the table
    * that answers "how deep do the whales go" when setting per-user
    * quotas (q93) and deciding whether skew handling (q117) is
    * load-bearing. Deciles are EXACT boundary splits: decile i takes
    * users at ranks (i−1)·n div 10 + 1 .. i·n div 10 from the top, so a
    * tie block straddling a boundary is split by COUNT (take =
    * clamp(hi_rank − users_above) per block — the q145/q153 straddle
    * discipline, tie-invariant because every member of a tie block
    * contributes the same activity). Σ decile shares telescopes to the
    * total exactly; the spec pins both that and monotone non-increasing
    * per-user intensity down the deciles.
    *
    * Scale shape: per-user counts (user-keyed, map-side combinable) →
    * (type, activity) histogram (value-domain-bounded) → one descending
    * cumulative window → 10-way literal explode → |types|·10 rollup.
    */
  def q155DecileLift(s: SparkSession, d: String): DataFrame = {
    val wT = Window.partitionBy("event_type")
    val wDesc = wT.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("v"))
      .groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("m"))
      .withColumn("n", sum(col("m")).over(wT))
      .withColumn("t", sum(col("v") * col("m")).over(wT))
      .withColumn("above", coalesce(sum(col("m")).over(wDesc), lit(0L)))
      .withColumn("dec", explode(expr(
        "array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)")))
      .withColumn("lo_rank", expr("(dec - 1) * n DIV 10"))
      .withColumn("hi_rank", expr("dec * n DIV 10"))
      .withColumn("take", greatest(lit(0L),
        least(col("m"), col("hi_rank") - col("above"))
          - greatest(lit(0L), col("lo_rank") - col("above"))))
      .groupBy("event_type", "dec")
      .agg(max(expr("hi_rank - lo_rank")).as("n_users"),
        sum(col("take") * col("v")).as("events"),
        max(col("t")).as("t"))
      .withColumn("share_ppm", expr("events * 1000000 DIV t"))
      .withColumn("cum_share_ppm",
        expr("sum(events) OVER (PARTITION BY event_type ORDER BY dec" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)" +
          " * 1000000 DIV t"))
      .select(col("event_type"), col("dec"), col("n_users"),
        col("events").as("n_events"), col("share_ppm"),
        col("cum_share_ppm"))
      .orderBy("event_type", "dec")
  }

  val q155Oracle: String =
    """WITH ua AS (
      |  SELECT event_type, user_id, count(*) AS v
      |  FROM events GROUP BY 1, 2),
      |h AS (
      |  SELECT event_type, v, count(*) AS m FROM ua GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, v, m,
      |    sum(m) OVER (PARTITION BY event_type) AS n,
      |    sum(v * m) OVER (PARTITION BY event_type) AS t,
      |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      |  FROM h),
      |x AS (
      |  SELECT w.*, d.dec,
      |    (d.dec - 1) * n // 10 AS lo_rank, d.dec * n // 10 AS hi_rank
      |  FROM w CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7), (8),
      |    (9), (10)) d(dec)),
      |g AS (
      |  SELECT event_type, CAST(dec AS BIGINT) AS dec,
      |    max(hi_rank - lo_rank) AS n_users,
      |    sum(greatest(0, least(m, hi_rank - above)
      |      - greatest(0, lo_rank - above)) * v) AS events,
      |    max(t) AS t
      |  FROM x GROUP BY 1, 2)
      |SELECT event_type, dec, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(events AS BIGINT) AS n_events,
      |  CAST(events * 1000000 // t AS BIGINT) AS share_ppm,
      |  CAST(sum(events) OVER (PARTITION BY event_type ORDER BY dec
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    * 1000000 // t AS BIGINT) AS cum_share_ppm
      |FROM g ORDER BY event_type, dec""".stripMargin

  // --- Tail (p90) trend (q159) --------------------------------------------

  /** q159: TAIL TREND — "is my p90 drifting": the composition ops teams
    * actually watch. q141's OLS slope tracks the MEAN, but capacity
    * incidents live in the tail, and a mean-flat stream whose p90
    * climbs is the classic slow-burn regression. Stage 1 computes each
    * day's EXACT type-1 p90 (value at rank ⌈0.9·n_d⌉ = (9·n_d+9) div
    * 10, resolved as min(v | cum ≥ rank) over the per-(type, day)
    * cents histogram — the q154 discipline at day grain); stage 2 runs
    * q141's integer OLS over (day index, p90): centered-x moments in
    * decimal(38,0), sign-factored division, milli-cents-per-day slope.
    * Day index is epoch_day − per-type min via an unordered partition
    * window (no second scan).
    *
    * Scale shape: one events scan → (type, day, cents) histogram
    * (map-side combinable); the cumulative window partitions per
    * (type, day) — day-bounded, embarrassingly parallel; the trend
    * moments ride the (type, day) frame. Never a corpus-wide sort.
    */
  def q159TailTrend(s: SparkSession, d: String): DataFrame = {
    val wDay = Window.partitionBy("event_type", "day")
    val wCum = wDay.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("event_type", "day", "cents").agg(count(lit(1)).as("m"))
      .withColumn("nd", sum(col("m")).over(wDay))
      .withColumn("cum", sum(col("m")).over(wCum))
      .groupBy("event_type", "day")
      .agg(min(when(col("cum") >= expr("(9 * nd + 9) DIV 10"),
        col("cents"))).as("p90"))
    daily
      .withColumn("x", expr("datediff(day, DATE '1970-01-01') - " +
        "min(datediff(day, DATE '1970-01-01')) OVER " +
        "(PARTITION BY event_type)").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        big(sum(big(col("x")))).as("sx"),
        big(sum(big(col("p90")))).as("sy"),
        big(sum(big(col("x")) * big(col("p90")))).as("sxy"),
        big(sum(big(col("x")) * big(col("x")))).as("sxx"),
        min(col("p90")).as("min_p90"), max(col("p90")).as("max_p90"))
      .withColumn("num", big(col("n_days")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", big(col("n_days")) * col("sxx") - col("sx") * col("sx"))
      .select(col("event_type"), col("n_days"), col("min_p90"), col("max_p90"),
        expr("sy * 1000 DIV n_days").cast("long").as("mean_p90_mcents"),
        expr("CASE WHEN den > 0 THEN CAST(sign(num) AS DECIMAL(38,0)) * " +
          "(abs(num) * 1000 DIV den) END").cast("long")
          .as("p90_slope_mcents_per_day"))
      .orderBy("event_type")
  }

  val q159Oracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS m
      |  FROM events GROUP BY 1, 2, 3),
      |w AS (
      |  SELECT event_type, day, cents,
      |    sum(m) OVER (PARTITION BY event_type, day) AS nd,
      |    sum(m) OVER (PARTITION BY event_type, day ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM h),
      |daily AS (
      |  SELECT event_type, day,
      |    min(CASE WHEN cum >= (9 * nd + 9) // 10 THEN cents END) AS p90
      |  FROM w GROUP BY 1, 2),
      |cx AS (
      |  SELECT event_type, p90,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - min(date_diff('day', DATE '1970-01-01', day))
      |        OVER (PARTITION BY event_type) AS x
      |  FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(p90 AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * p90) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    min(p90) AS min_p90, max(p90) AS max_p90
      |  FROM cx GROUP BY 1),
      |f AS (
      |  SELECT event_type, n, min_p90, max_p90, sy,
      |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      |  FROM m)
      |SELECT event_type, n AS n_days, min_p90, max_p90,
      |  CAST(sy * 1000 // n AS BIGINT) AS mean_p90_mcents,
      |  CAST(CASE WHEN den > 0 THEN sign(num) * (abs(num) * 1000 // den)
      |    END AS BIGINT) AS p90_slope_mcents_per_day
      |FROM f ORDER BY event_type""".stripMargin

  // --- Gap-fill linear interpolation (q227) ---------------------------------

  /** q227: TIME-SERIES GAP FILL — linear interpolation of missing
    * daily observations, the standard repair step before any
    * fixed-cadence consumer (forecasting features, q146 autocorrelation,
    * q157 seasonality all assume a dense grid). The observed series is
    * the per-(type, day) cents total RESTRICTED to days with
    * `epoch_day % 5 < 3` — a deterministic sensor-dropout pattern that
    * guarantees 2-day gaps at every scale factor — and each gap day d
    * between surviving neighbors (d₀,v₀) → (d₁,v₁) fills with the
    * exact integer lerp `(v₀·(d₁−d) + v₁·(d−d₀)) div (d₁−d₀)`
    * (all operands positive — events.value > 0 — so Spark's truncating
    * `div` and DuckDB's flooring `//` agree; the memory-bank division
    * rule). Output rows carry `src` obs/interp so consumers can weight
    * repaired points.
    *
    * Scale shape: one corpus aggregate to the (type, day) grid;
    * everything after (lead window, gap explode, union) rides that
    * domain-sized frame — grid cells, never events. Endpoints need no
    * policy: the grid spans observed days only, so every gap is
    * interior by construction.
    */
  def q227GapFill(s: SparkSession, d: String): DataFrame = {
    val day = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
      .cast("long")
    val obs = events(s, d)
      .select(col("event_type"), day.as("day"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .filter(pmod(col("day"), lit(5)) < 3)
      .groupBy("event_type", "day").agg(sum("c").as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val gaps = obs
      .withColumn("nd", lead("day", 1).over(w))
      .withColumn("nv", lead("cents", 1).over(w))
      .filter(col("nd") > col("day") + 1)
      .select(col("event_type"), col("day").as("pd"), col("cents").as("pv"),
        col("nd"), col("nv"),
        explode(sequence(col("day") + 1, col("nd") - 1)).as("day2"))
      .select(col("event_type"), col("day2").as("day"),
        expr("(pv * (nd - day2) + nv * (day2 - pd)) div (nd - pd)")
          .as("cents"),
        lit("interp").as("src"))
    obs.withColumn("src", lit("obs"))
      .unionByName(gaps)
      .orderBy("event_type", "day")
  }

  val q227Oracle: String =
    """WITH pts AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events),
      |obs AS (
      |  SELECT event_type, day, sum(c) AS cents
      |  FROM pts WHERE day % 5 < 3 GROUP BY 1, 2),
      |nx AS (
      |  SELECT event_type, day, cents,
      |    lead(day) OVER (PARTITION BY event_type ORDER BY day) AS nd,
      |    lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS nv
      |  FROM obs),
      |gaps AS (
      |  SELECT n.event_type, u.d AS day,
      |    (n.cents * (n.nd - u.d) + n.nv * (u.d - n.day)) // (n.nd - n.day)
      |      AS cents,
      |    'interp' AS src
      |  FROM nx n, LATERAL (
      |    SELECT unnest(generate_series(n.day + 1, n.nd - 1)) AS d) u
      |  WHERE n.nd IS NOT NULL AND n.nd > n.day + 1)
      |SELECT event_type, CAST(day AS BIGINT) AS day,
      |  CAST(cents AS BIGINT) AS cents, src FROM (
      |  SELECT event_type, day, cents, 'obs' AS src FROM obs
      |  UNION ALL SELECT * FROM gaps) t
      |ORDER BY event_type, day""".stripMargin
}
