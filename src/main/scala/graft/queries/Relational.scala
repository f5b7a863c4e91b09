package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables._
import graft.ops.Cleaning

/** Relational parity queries — every operator family in SURVEY.md §2
  * re-expressed over the driver's TPC-H-ish tables (FIXTURES.md §B role
  * mapping: orders/lineitem = fact, nation/region/customer = dims).
  *
  * Design rules applied throughout:
  *   - declarative DataFrame plans (Catalyst does pushdown/pruning/reorder);
  *   - `broadcast()` on every bounded dimension so no fact-side shuffle is
  *     spent on a join that fits in memory at any scale;
  *   - floating aggregates rounded in-plan so results are stable across
  *     engines (the DuckDB oracle applies identical rounding);
  *   - every output deterministically ordered (driver hash-compares rows).
  */
object Relational {

  // Cross-engine numeric determinism helpers — see graft.queries.Num.
  import Num.{dec, sumD, avgD, sumM, avgM}

  /** Fact/large-table reads go through the maintained layouts (bucketed
    * lineitem, split orders/customer — see [[graft.sources.Layouts]] and
    * the twin note in [[Warehouse]]): same rows, splittable files, so the
    * map side parallelizes where the one-row-group fixture would pin it
    * to a single task. Shadows the `Tables._` import for this object;
    * small dims (part/supplier/nation/region) stay on the raw fixture —
    * they broadcast anyway.
    */
  private def lineitem(s: SparkSession, d: String): DataFrame =
    Warehouse.bucketedLineitem(s, d)
  private def orders(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.orders(s, d)
  private def customer(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.customer(s, d)

  /** S1/P2/P5 — projected, filtered scan. Filter + projection must reach the
    * parquet reader (PushedFilters/ReadSchema in explain).
    */
  def q01ScanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // limit bounds the verified output: ORDER BY + LIMIT plans as
      // TakeOrderedAndProject (per-partition heaps), so no global sort
      // grows with the fact table — the unbounded orderBy this replaces
      // was a determinism aid that would range-partition the whole
      // filtered fact at scale. The synthetic fixture does NOT enforce
      // TPC-H's (l_orderkey, l_linenumber) uniqueness (143k duplicate
      // pairs at sf0.1), so the sort lists EVERY projected column — rows
      // still tied are bytewise identical and any order of them is the
      // same output.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(5000)

  val q01Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 5000""".stripMargin

  /** F2/F3/A9 — slugify (reference transform_weather.py:21-26) + distinct. */
  def q02Slugify(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(Cleaning.slugify(col("p_type"), col("p_brand")).as("slug"))
      .distinct()
      .orderBy("slug")

  val q02Oracle: String =
    """SELECT DISTINCT trim(regexp_replace(lower(concat_ws('_', p_type, p_brand)), '[^a-z0-9]+', '_', 'g'), '_') AS slug
      |FROM part ORDER BY slug""".stripMargin

  /** A1/A3 — wide group-by aggregation (the reference's daily-weather
    * rollup shape, transform_weather.py:124-139; TPC-H Q1 analog).
    * Partial (map-side) aggregation makes this one shuffle of tiny
    * pre-aggregated state regardless of input size.
    */
  def q03PricingSummary(s: SparkSession, d: String): DataFrame = {
    // The three RAW money columns are summed on the split-long fast path
    // (bit-safe substitution for sum(decM(x)) on ≤4-decimal data — see
    // ExactDecimal.compute; equality vs the decimal formulation asserted
    // in ExactDecimalSpec), each aggregated ONCE and reused by its sum_*
    // and avg_* outputs (the naive agg computed sum(decM(l_quantity))
    // twice — decimal aggs are not CSE'd). The double-rounded product
    // rides splitProductSums (exact long arithmetic over the 2-decimal
    // inputs, bit-equal to the decimal cast — see its scaladoc).
    import graft.functions.ExactDecimal
    val sums =
      ExactDecimal.splitSums(col("l_quantity"), 6, "qty") ++
        ExactDecimal.splitSums(col("l_extendedprice"), 6, "price") ++
        ExactDecimal.splitSums(col("l_discount"), 6, "disc") ++
        ExactDecimal.splitProductSums(col("l_extendedprice"), col("l_discount"), "dp") ++ Seq(
        count(col("l_quantity")).as("n_qty"),
        count(col("l_extendedprice")).as("n_price"),
        count(col("l_discount")).as("n_disc"),
        count(lit(1)).as("count_order"))
    def t(tag: String): Column = ExactDecimal.totalOf(tag, 6)
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sums.head, sums.tail: _*)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(t("qty"), 2).cast("double").as("sum_qty"),
        round(t("price"), 2).cast("double").as("sum_base_price"),
        round(ExactDecimal.totalOf("dp", 4), 2).cast("double").as("sum_disc_price"),
        round(t("qty").cast("double") / col("n_qty"), 4).as("avg_qty"),
        round(t("price").cast("double") / col("n_price"), 4).as("avg_price"),
        round(t("disc").cast("double") / col("n_disc"), 4).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q03Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1/J6/A3 — snowflake enrichment through two broadcast dims. */
  def q04RegionRollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_customers"),
        sumD(col("c_acctbal"), 2).as("total_bal"),
        avgD(col("c_acctbal"), 4).as("avg_bal"))
      .orderBy("r_name")

  val q04Oracle: String =
    """SELECT r_name, count(*) AS n_customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE) AS total_bal,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) / count(c_acctbal), 4) AS avg_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** J2 — left m:1 enrichment join (clean_ticket_sales.py:123-128 shape);
    * count(col) vs count(*) shows match-rate semantics.
    */
  def q05LeftJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val c = customer(s, d).select("c_custkey", "c_name")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("c_name")).as("n_matched"),
        sumD(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderstatus")
  }

  val q05Oracle: String =
    """SELECT o_orderstatus, count(*) AS n_orders, count(c_name) AS n_matched,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS total_price
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** EDA #6 analog (sql/10_eda_queries.sql:110-120): fact-to-fact join +
    * count distinct. The lineitem↔orders join shuffles on orderkey; at
    * scale both sides would be bucketed on the key to make it co-located.
    */
  def q06PrioritySummary(s: SparkSession, d: String): DataFrame = {
    // Aggregate-below-join rewrite (round 4): lineitem is pre-aggregated
    // per l_orderkey BEFORE joining orders, so (a) the join input shrinks
    // ~4x (lines → orders), (b) COUNT(DISTINCT o_orderkey) becomes a free
    // count(*) over the now-unique join key — no distinct-agg expand
    // plan, and (c) at 100 TB the shuffle carries per-order partials
    // instead of raw lines. Bit-safe: decimal sums and split-long partial
    // sums are exactly associative, so sum-of-per-order-sums equals the
    // direct sum (asserted vs the join-then-aggregate formulation in
    // ExactDecimalSpec). avg_qty's raw money column rides the split-long
    // fast path; the double-rounded revenue product keeps the decimal
    // cast (q03's reasoning).
    import graft.functions.ExactDecimal
    val perOrderAggs = ExactDecimal.splitSums(col("l_quantity"), 6, "qty") ++
      ExactDecimal.splitProductSums(col("l_extendedprice"), col("l_discount"), "rev") ++ Seq(
      count(lit(1)).as("n_lines_o"),
      count(col("l_quantity")).as("n_qty_o"))
    val perOrder = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(perOrderAggs.head, perOrderAggs.tail: _*)
    perOrder
      .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("n_lines_o")).as("n_lines"),
        // hi/lo partial pairs are plain longs, so re-summing per-order
        // partials is exactly associative; alias back to the hi_/lo_
        // names so totalOf can recombine
        sum(col("hi_rev")).as("hi_rev"),
        sum(col("lo_rev")).as("lo_rev"),
        sum(col("hi_qty")).as("hi_qty2"),
        sum(col("lo_qty")).as("lo_qty2"),
        sum(col("n_qty_o")).as("n_qty"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_lines"),
        round(ExactDecimal.totalOf("rev", 4), 2).cast("double").as("revenue"),
        round(((col("hi_qty2").cast("decimal(38,0)") * lit(1L << ExactDecimal.SplitShift) +
          col("lo_qty2").cast("decimal(38,0)")) *
          lit(new java.math.BigDecimal(java.math.BigInteger.ONE, 6))).cast("double")
          / col("n_qty"), 4).as("avg_qty"))
      .orderBy("o_orderpriority")
  }

  val q06Oracle: String =
    """SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
      |  count(*) AS n_lines,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** O3 — top-k: Spark plans ORDER BY + LIMIT as TakeOrderedAndProject
    * (per-partition heaps, no global sort).
    */
  def q07TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val q07Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** P7 — HAVING post-aggregation filter (sql/10_eda_queries.sql:100). */
  def q08Having(s: SparkSession, d: String): DataFrame = {
    // Raw ≤2-decimal columns summed at the oracle's scale 10 ride the
    // split-long fast path (scale-10 bit-equality on raw money columns is
    // pinned in ExactDecimalSpec) instead of the non-compact decimal(38,10)
    // accumulator (~450 ns/row): q08 0.86 → ~0.45 s at sf0.1.
    import graft.functions.ExactDecimal
    val sums = ExactDecimal.splitSums(col("l_discount"), 10, "disc") ++
      ExactDecimal.splitSums(col("l_quantity"), 10, "qty") ++ Seq(
      count(lit(1)).as("n_lines"),
      count(col("l_discount")).as("n_disc"))
    lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(sums.head, sums.tail: _*)
      .select(col("l_suppkey"), col("n_lines"),
        round(ExactDecimal.totalOf("disc", 10).cast("double") / col("n_disc"), 4)
          .as("avg_disc"),
        round(ExactDecimal.totalOf("qty", 10), 2).cast("double").as("sum_qty"))
      .filter(col("avg_disc") > 0.05)
      .orderBy("l_suppkey")
  }

  val q08Oracle: String =
    """SELECT l_suppkey, count(*) AS n_lines,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey
      |HAVING round(CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(l_discount), 4) > 0.05
      |ORDER BY l_suppkey""".stripMargin

  /** A5 — COUNTIF (sql/10_eda_queries.sql:131-133): conditional count. */
  def q09CountIf(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q09Oracle: String =
    """SELECT o_orderpriority,
      |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** A7 — CORR aggregate (sql/10_eda_queries.sql:79-82). Computed from
    * exact DECIMAL co-moment sums rather than the built-in corr(): the
    * built-in's co-moment merge is partition-completion-order dependent
    * (round-2 advice — the rounded value can flip at a boundary
    * run-to-run). With the five sums exact and the final float formula
    * evaluated in one fixed order on both engines, the result is
    * bit-stable. Identity: corr = (n·Σxy − ΣxΣy) /
    * (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)).
    */
  def q10Corr(s: SparkSession, d: String): DataFrame = {
    // decimal(18,6) granularity fits every moment here: max
    // |l_extendedprice|^2 ~ 1.2e10 -> 11 integral digits + 6 scale <= 18,
    // and the corr formula is insensitive to the 1e-6 cast granularity
    // (perturbations enter the co-moment sums at ~1e-15 relative).
    //
    // The nine distinct moments are aggregated ONCE (the earlier per-corr
    // helper duplicated the shared price sums) and — the round-4 change —
    // each decimal moment is summed as TWO primitive LONG sums of the
    // exactly-scaled value (ExactDecimal.ScaledLong6: half-up of the exact
    // binary value ×10⁶, no BigDecimal; ≤1-unscaled-unit from the cast's
    // shortest-repr rounding on double-rounded products, which this corr
    // absorbs at relative 1e-15 — see ExactDecimal's scaladoc and
    // ExactDecimalSpec) split at 2^27, recombined exactly in DECIMAL once
    // per group. The final corr values are bit-identical to the decimal-sum
    // formulation (asserted in ExactDecimalSpec); the hot path drops from
    // ~450 ns/row/moment (BigDecimal churn) to plain codegen'd long adds.
    // The split keeps partials overflow-free to ~6e9 rows per group;
    // beyond that pre-aggregate per partition first.
    import graft.functions.ExactDecimal
    def corrOf(n: Column, sx: Column, sy: Column, sxy: Column,
        sx2: Column, sy2: Column): Column =
      round((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
    val q = col("l_quantity"); val dc = col("l_discount"); val p = col("l_extendedprice")
    val moments = Seq(
      "q" -> q, "d" -> dc, "p" -> p, "qp" -> (q * p), "dp" -> (dc * p),
      "q2" -> (q * q), "d2" -> (dc * dc), "p2" -> (p * p))
    val sums = moments.flatMap { case (t, x) => ExactDecimal.splitSums(x, 6, t) }
    def m(t: String): Column = ExactDecimal.momentD(t, 6)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"), sums: _*)
      .select(col("l_returnflag"),
        corrOf(col("n"), m("q"), m("p"), m("qp"), m("q2"), m("p2"))
          .as("corr_qty_price"),
        corrOf(col("n"), m("d"), m("p"), m("dp"), m("d2"), m("p2"))
          .as("corr_disc_price"))
      .orderBy("l_returnflag")
  }

  val q10Oracle: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sqp,
      |    CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sdp,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq2,
      |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd2,
      |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp2
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  round((n * sqp - sq * sp) / (sqrt(n * sq2 - sq * sq) * sqrt(n * sp2 - sp * sp)), 6) AS corr_qty_price,
      |  round((n * sdp - sd * sp) / (sqrt(n * sd2 - sd * sd) * sqrt(n * sp2 - sp * sp)), 6) AS corr_disc_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** A6 — ANY_VALUE on a functionally-dependent column
    * (sql/02_create_dims_and_facts.sql:107-108) — deterministic because
    * n_name is unique per nationkey.
    */
  def q11AnyValue(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_nationkey")
      .agg(
        any_value(col("n_name")).as("nation_name"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")

  val q11Oracle: String =
    """SELECT c_nationkey, any_value(n_name) AS nation_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** A9 — SELECT DISTINCT dim extraction (sql/02:22-26). */
  def q12Distinct(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_mktsegment").distinct().orderBy("c_mktsegment")

  val q12Oracle: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** J5 — true cross join (the reference emulates it with a dummy key,
    * clean_section_capacity.py:105-108; Spark has the real operator).
    */
  def q13CrossJoin(s: SparkSession, d: String): DataFrame =
    nation(s, d).select("n_name")
      .crossJoin(broadcast(region(s, d).select("r_name")))
      .orderBy("n_name", "r_name")

  val q13Oracle: String =
    """SELECT n_name, r_name FROM nation CROSS JOIN region
      |ORDER BY n_name, r_name""".stripMargin

  /** U1 — union-all of heterogeneous sources, aligned by name
    * (ingest_weather.py:103 per-market concat shape).
    */
  def q14Union(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d).select(
      lit("supplier").as("kind"), col("s_name").as("name"),
      round(col("s_acctbal"), 2).as("acctbal"))
    val cus = customer(s, d).select(
      lit("customer").as("kind"), col("c_name").as("name"),
      round(col("c_acctbal"), 2).as("acctbal"))
    sup.unionByName(cus).orderBy("kind", "name")
  }

  val q14Oracle: String =
    """SELECT * FROM (
      |  SELECT 'supplier' AS kind, s_name AS name, round(s_acctbal, 2) AS acctbal FROM supplier
      |  UNION ALL
      |  SELECT 'customer' AS kind, c_name AS name, round(c_acctbal, 2) AS acctbal FROM customer
      |) ORDER BY kind, name""".stripMargin

  /** F13/F14/F15 — CASE ladder + arithmetic binning
    * (sql/10_eda_queries.sql:49-61,155).
    */
  def q15PriceBands(s: SparkSession, d: String): DataFrame = {
    val band = when(col("o_totalprice") < 100000, "low")
      .when(col("o_totalprice") <= 250000, "mid")
      .otherwise("high")
    val bin = round(col("o_totalprice") / 50000) * 50000
    orders(s, d)
      .groupBy(band.as("price_band"), bin.as("price_bin"))
      .agg(count(lit(1)).as("n_orders"), avgD(col("o_totalprice"), 2).as("avg_price"))
      .orderBy("price_band", "price_bin")
  }

  val q15Oracle: String =
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice <= 250000 THEN 'mid'
      |            ELSE 'high' END AS price_band,
      |  round(o_totalprice / 50000) * 50000 AS price_bin,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) / count(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** F17 — date-part extraction incl. ISO week and day name
    * (sql/02_create_dims_and_facts.sql:59-64). Cast to long: DuckDB's
    * date parts are BIGINT and the driver compares schemas.
    */
  def q16DateParts(s: SparkSession, d: String): DataFrame = {
    val dt = to_date(col("o_orderdate"))
    orders(s, d)
      .select(
        year(dt).cast("long").as("y"),
        month(dt).cast("long").as("m"),
        dayofmonth(dt).cast("long").as("day"),
        weekofyear(dt).cast("long").as("iso_week"),
        date_format(dt, "EEEE").as("day_name"))
      .distinct()
      .orderBy("y", "m", "day")
  }

  val q16Oracle: String =
    """SELECT DISTINCT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS day, weekofyear(o_orderdate) AS iso_week,
      |  dayname(o_orderdate) AS day_name
      |FROM orders ORDER BY y, m, day""".stripMargin

  /** F18 — date spine via sequence+explode (the reference's
    * GENERATE_DATE_ARRAY+UNNEST, sql/02:65) left-joined to daily counts.
    */
  def q17DateSpine(s: SparkSession, d: String): DataFrame = {
    val spine = s.range(1).select(
      explode(sequence(
        to_date(lit("1996-01-01")), to_date(lit("1996-03-31")),
        expr("interval 1 day"))).as("d"))
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
    spine.join(broadcast(daily), Seq("d"), "left")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("d")
  }

  val q17Oracle: String =
    """WITH spine AS (
      |  SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY)) AS DATE) AS d
      |), daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n FROM orders GROUP BY 1
      |)
      |SELECT spine.d AS d, COALESCE(daily.n, 0) AS n_orders
      |FROM spine LEFT JOIN daily USING (d) ORDER BY d""".stripMargin

  /** F16 — null-safe division (BigQuery SAFE_DIVIDE → try_divide,
    * sql/02:106-108), incl. a forced divide-by-zero that must yield null.
    */
  def q18SafeDivide(s: SparkSession, d: String): DataFrame = {
    // raw money columns at Num.dec's scale 10 on the split-long fast path
    // (bit-safe: ≤4-decimal values sit 1e-11 inside the 5e-11 half-grid;
    // equality vs the decimal formulation asserted in ExactDecimalSpec)
    import graft.functions.ExactDecimal
    val sums = ExactDecimal.splitSums(col("l_extendedprice"), 10, "p") ++
      ExactDecimal.splitSums(col("l_quantity"), 10, "q") :+
      sum("l_quantity").as("sum_qty_raw")
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sums.head, sums.tail: _*)
      .select(col("l_returnflag"),
        round(try_divide(
          ExactDecimal.momentD("p", 10),
          nullif(ExactDecimal.momentD("q", 10), lit(0.0))), 4)
          .as("price_per_qty"),
        try_divide(col("sum_qty_raw"), lit(0)).as("div_by_zero"))
      .orderBy("l_returnflag")
  }

  val q18Oracle: String =
    """SELECT l_returnflag,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE)
      |        / nullif(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 0), 4) AS price_per_qty,
      |  sum(l_quantity) / nullif(0, 0) AS div_by_zero
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** W — window functions (beyond-reference extension; SURVEY.md §2.5 W1):
    * per-customer top-3 with running sum. Partitioned by `o_custkey` — a
    * high-cardinality key, so the window shuffle spreads evenly across
    * executors at any scale (a low-cardinality partition key like
    * order priority would funnel the whole table into 5 tasks).
    */
  def q19WindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("cum_price"))
      .filter(col("rn") <= 3)
      // Top-k bound (see q01): (o_custkey, rn) is unique, so the limited
      // slice is a total order and the final ordering never becomes a
      // global sort that grows with |customers|.
      .orderBy("o_custkey", "rn")
      .limit(5000)
  }

  val q19Oracle: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS cum_price
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 5000""".stripMargin

  /** Anti join (NOT EXISTS) — customers who never placed an urgent order. */
  def q20AntiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q20Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Semi join (EXISTS) — customers with at least one 250k+ finished order. */
  def q21SemiJoin(s: SparkSession, d: String): DataFrame = {
    val big = orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000)
    customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q21Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
      |                AND o_totalprice > 250000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Grouping sets (beyond-reference): ROLLUP over the region/nation
    * hierarchy with explicit null ordering for cross-engine determinism.
    */
  def q22Rollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // Alias the grouping keys: a rollup re-creates the grouping columns,
      // so sorting on an unqualified `r_name` would be ambiguous against
      // the join inputs still present in the lineage.
      .rollup(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_customers"), sumD(col("c_acctbal"), 2).as("total_bal"))
      .orderBy(col("region_name").asc_nulls_first, col("nation_name").asc_nulls_first)

  val q22Oracle: String =
    """SELECT r_name AS region_name, n_name AS nation_name,
      |  count(*) AS n_customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(region_name, nation_name)
      |ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin

  /** O1/J3/J4 shape — multi-dim m:1 enrichment (two broadcast dims, no
    * fact-side shuffle) aggregated to a bounded rollup, then a multi-key
    * deterministic sort (integrate_weather_sales.py:129-163). The agg
    * happens *before* the sort so the only global ordering in the plan is
    * over |brands|×|suppliers| rows — scale-safe, unlike sorting the full
    * enriched fact.
    */
  def q23EnrichedAgg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val p = part(s, d).select("p_partkey", "p_brand")
    val sup = supplier(s, d).select("s_suppkey", "s_name")
    // avg_qty's raw money column AND the net-revenue product both ride
    // the split-long fast path (the product via splitProductSums — exact
    // long arithmetic over the 2-decimal inputs, bit-equal to the
    // decimal cast; see its scaladoc). The supplier dim attaches AFTER
    // the aggregate: suppkey→s_name is 1:1 (supplier PK), so grouping by
    // (p_brand, l_suppkey) is the same partition of rows and the name
    // lookup probes once per GROUP, not once per fact row — at 100 TB
    // that's a million-fold fewer probes, and locally q23 1.30 → 1.07 s.
    import graft.functions.ExactDecimal
    val sums = ExactDecimal.splitSums(col("l_quantity"), 6, "qty") ++
      ExactDecimal.splitProductSums(col("l_extendedprice"), col("l_discount"), "nr") ++ Seq(
      count(col("l_quantity")).as("n_qty"),
      count(lit(1)).as("n_lines"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_suppkey")
      .agg(sums.head, sums.tail: _*)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_brand"), col("s_name"),
        col("n_lines"),
        round(ExactDecimal.totalOf("nr", 4), 2).cast("double").as("net_revenue"),
        round(ExactDecimal.totalOf("qty", 6).cast("double") / col("n_qty"), 4).as("avg_qty"))
      .orderBy("p_brand", "s_name")
  }

  val q23Oracle: String =
    """SELECT p_brand, s_name, count(*) AS n_lines,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS net_revenue,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand, s_name
      |ORDER BY p_brand, s_name""".stripMargin

  /** F1/F4/F7/F9/P6 — the messy-input cleaning kernel, end-to-end: dates
    * are re-serialized to the reference's raw `M/d/yyyy` format
    * (clean_ticket_sales.py:91) and re-parsed via the coalesce-of-formats
    * chain; prices become padded strings with injected garbage and are
    * coerced back (null on failure, `errors="coerce"`); priorities are
    * lowercased and restored with Python `str.title()` parity (hyphen =
    * word boundary); banker's rounding over exact .5 values proves the
    * bround/round distinction the oracle emulates explicitly.
    */
  def q34MessyParse(s: SparkSession, d: String): DataFrame = {
    // split layout: the parse kernels are CPU-bound and the raw fixture
    // is one row group = one map task (graft.sources.Layouts)
    val messy = graft.sources.Layouts.orders(s, d).select(
      date_format(col("o_orderdate"), "M/d/yyyy").as("dt_str"),
      // every 10th order's price is garbage → coerceDouble must yield null
      when(col("o_orderkey") % 10 === 0, lit("n/a"))
        .otherwise(concat(lit("  "), col("o_totalprice").cast("string"), lit(" ")))
        .as("price_str"),
      lower(col("o_orderpriority")).as("prio_lower"),
      col("o_orderkey"))
    messy.select(
      Cleaning.parseDateMulti(col("dt_str")).as("d"),
      Cleaning.coerceDouble(col("price_str")).as("price"),
      Cleaning.normTitle(col("prio_lower")).as("priority"),
      Cleaning.flag(col("o_orderkey") % 2 === 0).as("is_even"),
      bround(col("o_orderkey") / lit(2.0), 0).as("half_even"))
      .groupBy(year(col("d")).cast("long").as("order_year"), col("priority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("price")).as("n_price_parsed"),
        sumD(col("price"), 2).as("total_price"),
        sum(col("is_even")).as("n_even"),
        sumD(col("half_even"), 2).as("sum_half_even"))
      .orderBy("order_year", "priority")
  }

  /** Oracle notes: DuckDB has no `initcap`/`str.title`, so title-casing is
    * emulated by splitting into letter/non-letter runs (same algorithm as
    * Cleaning.pythonTitle); DuckDB `round` is half-away-from-zero, so
    * banker's rounding of the exact-.5 values is emulated with a
    * floor-parity CASE.
    */
  val q34Oracle: String =
    """WITH messy AS (
      |  SELECT strftime(o_orderdate, '%-m/%-d/%Y') AS dt_str,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'n/a'
      |         ELSE '  ' || CAST(o_totalprice AS VARCHAR) || ' ' END AS price_str,
      |    lower(o_orderpriority) AS prio_lower,
      |    o_orderkey
      |  FROM orders),
      |cleaned AS (
      |  SELECT try_strptime(dt_str, '%-m/%-d/%Y')::DATE AS d,
      |    TRY_CAST(trim(price_str) AS DOUBLE) AS price,
      |    list_aggregate(list_transform(
      |      regexp_extract_all(prio_lower, '[a-zA-Z]+|[^a-zA-Z]+'),
      |      t -> CASE WHEN regexp_matches(t, '^[a-zA-Z]')
      |                THEN upper(t[1]) || lower(t[2:]) ELSE t END),
      |      'string_agg', '') AS priority,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS is_even,
      |    CASE WHEN o_orderkey / 2.0 = floor(o_orderkey / 2.0) + 0.5
      |         THEN (CASE WHEN CAST(floor(o_orderkey / 2.0) AS BIGINT) % 2 = 0
      |                    THEN floor(o_orderkey / 2.0)
      |                    ELSE floor(o_orderkey / 2.0) + 1 END)
      |         ELSE round(o_orderkey / 2.0) END AS half_even
      |  FROM messy)
      |SELECT CAST(year(d) AS BIGINT) AS order_year, priority,
      |  count(*) AS n_orders,
      |  count(price) AS n_price_parsed,
      |  CAST(round(sum(CAST(price AS DECIMAL(38,10))), 2) AS DOUBLE) AS total_price,
      |  CAST(sum(is_even) AS BIGINT) AS n_even,
      |  CAST(round(sum(CAST(half_even AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_half_even
      |FROM cleaned GROUP BY 1, 2 ORDER BY order_year, priority""".stripMargin

  /** J3/J4/J7 + F6 — compound-key (2-col) grouping of the fact at
    * (l_partkey, l_suppkey) grain splitting shipped vs returned lines
    * (the reference's every real join is multi-key,
    * integrate_weather_sales.py:129-160; the oracle states it as two
    * filtered CTEs LEFT-joined on the compound key).
    *
    * Single-scan shape (round-6 verdict item 1): the join-of-two-filtered-
    * aggregates formulation scans lineitem TWICE and pays a third
    * shuffle-adjacent join — at 100 TB that extra full scan is the whole
    * cost. Instead ONE groupBy computes both sides as conditional
    * aggregates (`sum(CASE WHEN flag …)`), then `filter(n_ship IS NOT
    * NULL)` reproduces the LEFT join's keep-only-shipped-groups semantics
    * and `coalesce` its null returned side. One scan, two shuffles
    * (compound-key agg, then the |suppliers|-bounded re-agg), zero joins.
    *
    * Quantity sums ride the split-long fast path
    * (ExactDecimal.splitSumsWhen, bit-safe for the raw ≤4-decimal
    * l_quantity — same substitution as q03/q18/q23): the ~200k-group
    * first level carries only primitive-long partials; the exact DECIMAL
    * total is recombined once per supplier, after the second-level long
    * re-sum.
    */
  def q35CompoundJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ExactDecimal
    val isShip = col("l_returnflag") =!= "R"
    val isRet = col("l_returnflag") === "R"
    // count(CASE WHEN ship) is 0 for a group with no shipped line, so the
    // n_ship > 0 filter below is exactly the LEFT side's existence test
    val aggs =
      ExactDecimal.splitSumsWhen(isShip, col("l_quantity"), 6, "qty") ++
        ExactDecimal.splitSumsWhen(isRet, col("l_quantity"), 6, "ret") :+
        count(when(isShip, lit(1))).as("n_ship")
    // read the maintained bucketed layout (8 files): the raw fixture is a
    // single row group, so a single-scan plan over it would serialize the
    // whole map side into one task — the layout restores the parallelism
    // the two-scan formulation used to get by accident
    Warehouse.bucketedLineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_ship") > 0)
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_part_supp"),
        sum(col("n_ship")).as("n_ship_lines"),
        sum(col("hi_qty")).as("hi_qty"),
        sum(col("lo_qty")).as("lo_qty"),
        sum(coalesce(col("hi_ret"), lit(0L))).as("hi_ret"),
        sum(coalesce(col("lo_ret"), lit(0L))).as("lo_ret"))
      .select(col("l_suppkey"), col("n_part_supp"), col("n_ship_lines"),
        round(ExactDecimal.totalOf("qty", 6), 2).cast("double").as("shipped_qty"),
        round(ExactDecimal.totalOf("ret", 6), 2).cast("double").as("returned_qty"))
      .orderBy("l_suppkey")
  }

  val q35Oracle: String =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty_dec, count(*) AS n_ship
      |  FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1, 2),
      |returned AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS returned_dec
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2)
      |SELECT l_suppkey, count(*) AS n_part_supp,
      |  CAST(sum(n_ship) AS BIGINT) AS n_ship_lines,
      |  CAST(round(sum(qty_dec), 2) AS DOUBLE) AS shipped_qty,
      |  CAST(round(sum(COALESCE(returned_dec, 0)), 2) AS DOUBLE) AS returned_qty
      |FROM shipped LEFT JOIN returned USING (l_partkey, l_suppkey)
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** A8/F19/S11 — re-aggregation of a pre-aggregated frame with GROUP BY
    * ordinals through spark.sql over temp views — the reference's
    * view-on-view re-agg (sql/03_create_views.sql:52-63) with ratio-of-sums
    * (ratio-of-sums ≠ mean-of-ratios, SURVEY §7.4.5) and percent scaling.
    */
  def q36ReaggOrdinals(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g36_orders")
    customer(s, d).createOrReplaceTempView("g36_customer")
    s.sql(
      """WITH cust_daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |    sum(CAST(o_totalprice AS DECIMAL(38,10))) AS spend_dec,
        |    count(*) AS n_orders
        |  FROM g36_orders GROUP BY 1, 2)
        |SELECT c_mktsegment,
        |  count(*) AS n_cust_days,
        |  CAST(round(sum(spend_dec), 2) AS DOUBLE) AS total_spend,
        |  round(CAST(sum(spend_dec) AS DOUBLE) / sum(n_orders), 4) AS avg_order_value,
        |  round(CAST(sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        * 100 / count(*), 4) AS pct_multi_order_days
        |FROM cust_daily JOIN g36_customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q36Oracle: String =
    """WITH cust_daily AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
      |    sum(CAST(o_totalprice AS DECIMAL(38,10))) AS spend_dec,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2)
      |SELECT c_mktsegment,
      |  count(*) AS n_cust_days,
      |  CAST(round(sum(spend_dec), 2) AS DOUBLE) AS total_spend,
      |  round(CAST(sum(spend_dec) AS DOUBLE) / sum(n_orders), 4) AS avg_order_value,
      |  round(CAST(sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |        * 100 / count(*), 4) AS pct_multi_order_days
      |FROM cust_daily JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- Local-supplier revenue: the deep join chain (q179) -----------------

  /** q179: LOCAL-SUPPLIER REVENUE — the TPC-H Q5 shape: revenue by
    * nation for orders placed in one region/year where the SUPPLIER is
    * in the CUSTOMER's nation (the c_nationkey = s_nationkey
    * correlated condition that makes Q5 the canonical join-order
    * benchmark). Six tables: lineitem⋈orders⋈customer⋈supplier⋈nation
    * ⋈region — the deepest chain in the surface, and deliberately
    * DECLARED flat: Catalyst's join reorder + AQE pick the physical
    * order, the nation⋈region dim pair is broadcast explicitly, and
    * the year/region filters sit at the scans (PushedFilters) so the
    * fact side arrives pruned. Revenue is exact integer centi-cents:
    * round(price·100)·(100 − round(disc·100)) — both factors exact on
    * the 2-decimal fixture domain, no double product anywhere.
    *
    * Scale shape: two fact joins are key-partitioned (orderkey, then
    * custkey/suppkey); supplier is NOT broadcast (at 100 TB it is a
    * full table, and the s_nationkey = c_nationkey condition rides the
    * suppkey equi-join as a residual); dims broadcast; one
    * |nations|-row rollup.
    */
  def q179LocalRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = broadcast(nation(s, d)
      .join(region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .as("rev_ccents"))
      .join(orders(s, d)
        .filter(expr("year(to_date(o_orderdate)) = 1996"))
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey")), Seq("l_suppkey"))
      .filter(col("s_nationkey") === col("c_nationkey"))
      .join(dims, col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_ccents"))
        .as("revenue_ccents"))
      .orderBy(col("revenue_ccents").desc, col("n_name"))
  }

  val q179Oracle: String =
    """SELECT n.n_name, count(*) AS n_lines,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS revenue_ccents
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  AND s.s_nationkey = c.c_nationkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |WHERE r.r_name = 'ASIA' AND year(CAST(o.o_orderdate AS DATE)) = 1996
      |GROUP BY 1 ORDER BY revenue_ccents DESC, n_name""".stripMargin

  // --- GROUPING SETS with grouping_id (q180) ------------------------------

  /** q180: GROUPING SETS — the explicit-set aggregation surface that
    * ROLLUP (q22) and CUBE (q51) are sugar for: exactly the four sets
    * ((flag), (status), (flag, status), ()) in ONE aggregate pass, with
    * `grouping_id()` disambiguating which set each output row belongs
    * to (the NULL-vs-missing trap: a grouped NULL and a rolled-up
    * placeholder are indistinguishable without it). Declared in SQL via
    * spark.sql on a registered view — GROUPING SETS is a first-class
    * part of the engine's SQL surface, and Spark lowers it to a single
    * Expand + hash aggregate (each input row fans out once per set,
    * partials combine map-side; no per-set rescan).
    *
    * Scale shape: one lineitem scan, Expand ×4, one shuffle on the
    * grouping columns + gid; output is Σ per-set group counts — a few
    * dozen rows at any corpus size.
    */
  def q180GroupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"))
      .createOrReplaceTempView("q180_lineitem")
    s.sql(
      """SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
        |    AS gid,
        |  l_returnflag, l_linestatus,
        |  count(*) AS n_lines, sum(qty) AS sum_qty
        |FROM q180_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |  (l_returnflag, l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  val q180Oracle: String =
    """SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
      |    AS BIGINT) AS gid,
      |  l_returnflag, l_linestatus,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |  (l_returnflag, l_linestatus), ())
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** events through the maintained split layout (the Warehouse.scala
    * discipline — splittable files for the day-windowed scan here). */
  private def events(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.events(s, d)

  // --- Intraday time-weighted average (q181) ------------------------------

  /** q181: TWAP — the time-weighted mean value per event type: each
    * observation holds until the NEXT same-day observation, and its
    * value is weighted by that holding duration (Σ cents·Δt DIV Σ Δt,
    * exact micro-second-weighted milli-cents on decimal(38,0)
    * products). A plain mean (emitted alongside over the SAME weighted
    * segments) overweights burst periods — many prints in one busy
    * minute count once each — while TWAP answers "what was the value
    * LEVEL over time", the number monitoring and finance actually
    * chart. Holding periods are INTRA-DAY ((type, day) windows, the
    * market-session convention): overnight gaps are not holdings, and
    * the window partition is day-bounded rather than a corpus-wide
    * per-type sort — the q141-family scale argument. Each day's last
    * observation has no successor and contributes no segment.
    */
  def q181Twap(s: SparkSession, d: String): DataFrame = {
    def big(c: Column): Column = c.cast("decimal(38,0)")
    val wD = Window.partitionBy("event_type", "day")
      .orderBy("us", "event_id")
    events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("nxt", lead(col("us"), 1).over(wD))
      .filter(col("nxt").isNotNull)
      .withColumn("gap", col("nxt") - col("us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segments"),
        big(sum(big(col("gap")))).as("t_us"),
        big(sum(big(col("cents")) * big(col("gap")))).as("cw"),
        big(sum(big(col("cents")))).as("sc"))
      .select(col("event_type"), col("n_segments"),
        col("t_us").cast("long").as("held_us"),
        expr("CASE WHEN t_us > 0 THEN CAST(cw * 1000 DIV t_us AS BIGINT)" +
          " END").as("twap_milli"),
        expr("CAST(sc * 1000 DIV n_segments AS BIGINT)").as("mean_milli"))
      .orderBy("event_type")
  }

  val q181Oracle: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS us,
      |    event_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT event_type, cents,
      |    lead(us) OVER (PARTITION BY event_type, day
      |      ORDER BY us, event_id) - us AS gap
      |  FROM e),
      |m AS (
      |  SELECT event_type, count(*) AS n_segments,
      |    sum(CAST(gap AS HUGEINT)) AS t_us,
      |    sum(CAST(cents AS HUGEINT) * gap) AS cw,
      |    sum(CAST(cents AS HUGEINT)) AS sc
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_segments, CAST(t_us AS BIGINT) AS held_us,
      |  CAST(CASE WHEN t_us > 0 THEN cw * 1000 // t_us END AS BIGINT)
      |    AS twap_milli,
      |  CAST(sc * 1000 // n_segments AS BIGINT) AS mean_milli
      |FROM m ORDER BY event_type""".stripMargin

  // --- Within-session funnel conversion (q182) ----------------------------

  /** q182: SESSION FUNNEL — does a session that SAW something BUY
    * something: per session-length band, the share of view-containing
    * sessions with a purchase strictly after the first view (ordered by
    * the (ts, event_id) total key — a purchase in the same session but
    * BEFORE any view is browsing-after-buying, not conversion). q89 is
    * the LIFETIME funnel; q33/q39 build sessions but never ask what
    * happens inside one — this joins the two: the q33 gap rule (new
    * session after 30 idle minutes), then ONE per-session aggregate
    * comparing min view key against max purchase key (tuple compare —
    * no ordered re-scan of the session), banded by session length.
    *
    * Scale shape: the q33 lag+cumsum windows (user-keyed), a
    * per-(user, session) aggregate, and a bands-row rollup; nothing
    * wider than one user's stream in any task.
    */
  def q182SessionFunnel(s: SparkSession, d: String): DataFrame = {
    val wU = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gapUs = 30L * 60L * 1000000L
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("us"), 1).over(wU))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") > col("prev") + gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(when(col("event_type") === "view",
          struct(col("us"), col("event_id")))).as("first_view"),
        max(when(col("event_type") === "purchase",
          struct(col("us"), col("event_id")))).as("last_purchase"))
      .withColumn("band", expr(
        """CASE WHEN n_events = 1 THEN '1' WHEN n_events = 2 THEN '2'
          |     WHEN n_events <= 5 THEN '3-5' WHEN n_events <= 10 THEN '6-10'
          |     ELSE '11+' END""".stripMargin))
      .withColumn("has_view", col("first_view").isNotNull)
      .withColumn("converted", col("first_view").isNotNull &&
        col("last_purchase").isNotNull &&
        col("first_view") < col("last_purchase"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_sessions"),
        count_if(col("has_view")).as("n_with_view"),
        count_if(col("converted")).as("n_converted"))
      .withColumn("conversion_ppm", expr(
        "CASE WHEN n_with_view > 0" +
          " THEN n_converted * 1000000 DIV n_with_view END"))
      .orderBy("band")
  }

  val q182Oracle: String =
    """WITH lagged AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev IS NULL OR us > prev + 1800000000
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sess AS (
      |  SELECT user_id, us, event_id, event_type,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |    min(CASE WHEN event_type = 'view' THEN (us, event_id) END)
      |      AS first_view,
      |    max(CASE WHEN event_type = 'purchase' THEN (us, event_id) END)
      |      AS last_purchase
      |  FROM sess GROUP BY 1, 2),
      |banded AS (
      |  SELECT CASE WHEN n_events = 1 THEN '1' WHEN n_events = 2 THEN '2'
      |           WHEN n_events <= 5 THEN '3-5' WHEN n_events <= 10
      |           THEN '6-10' ELSE '11+' END AS band,
      |    first_view IS NOT NULL AS has_view,
      |    first_view IS NOT NULL AND last_purchase IS NOT NULL
      |      AND first_view < last_purchase AS converted
      |  FROM agg),
      |g AS (
      |  SELECT band, count(*) AS n_sessions,
      |    count_if(has_view) AS n_with_view,
      |    count_if(converted) AS n_converted
      |  FROM banded GROUP BY 1)
      |SELECT band, n_sessions, CAST(n_with_view AS BIGINT) AS n_with_view,
      |  CAST(n_converted AS BIGINT) AS n_converted,
      |  CAST(CASE WHEN n_with_view > 0
      |    THEN n_converted * 1000000 // n_with_view END AS BIGINT)
      |    AS conversion_ppm
      |FROM g ORDER BY band""".stripMargin

  // --- Activation → retention cross-tab (q183) ----------------------------

  /** q183: ACTIVATION METRIC — does first-week intensity predict
    * week-4 retention: users bucketed by their activity count in days
    * 0–6 after first touch, and per bucket the share still active in
    * days 21–27, in exact ppm. This is the table behind every
    * "aha-moment" claim ("users who do X in week one retain") — q170
    * decomposes the daily line, q90 shows cohort decay; this CROSSES
    * early behavior with later survival, which neither does. Only
    * users whose week-4 window fits inside the corpus are scored
    * (first day ≤ max day − 27, the max a collected literal — an
    * unobservable week-4 is not churn, it's censoring).
    *
    * Scale shape: one events scan → per-(user, offset-class) counts
    * (the first-day attach is a user-keyed self-aggregate join), a
    * user-grain bucket row, a buckets-row rollup. No day×user grid.
    */
  def q183Activation(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firsts = ev.groupBy("user_id").agg(min(col("day")).as("fd"))
      .localCheckpoint(eager = true)
    val maxDay = ev.agg(max(col("day"))).collect().head.getDate(0)
    val scored = ev.join(firsts, Seq("user_id"))
      .filter(col("fd") <= date_sub(lit(maxDay), 27))
      .withColumn("off", datediff(col("day"), col("fd")))
      .groupBy("user_id")
      .agg(count_if(col("off") <= 6).as("activation"),
        count_if(col("off").between(21, 27)).as("w4"))
    scored
      .withColumn("bucket", expr(
        """CASE WHEN activation <= 10 THEN 'a:<=10'
          |     WHEN activation <= 15 THEN 'b:11-15'
          |     WHEN activation <= 20 THEN 'c:16-20'
          |     ELSE 'd:21+' END""".stripMargin))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        count_if(col("w4") > 0).as("n_retained_w4"))
      .withColumn("retention_ppm",
        expr("n_retained_w4 * 1000000 DIV n_users"))
      .orderBy("bucket")
  }

  val q183Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS fd FROM ev GROUP BY 1),
      |mx AS (SELECT max(day) AS md FROM ev),
      |sc AS (
      |  SELECT ev.user_id,
      |    count_if(date_diff('day', f.fd, ev.day) <= 6) AS activation,
      |    count_if(date_diff('day', f.fd, ev.day) BETWEEN 21 AND 27) AS w4
      |  FROM ev JOIN f USING (user_id)
      |  WHERE f.fd <= (SELECT md FROM mx) - INTERVAL 27 DAY
      |  GROUP BY 1),
      |b AS (
      |  SELECT CASE WHEN activation <= 10 THEN 'a:<=10'
      |           WHEN activation <= 15 THEN 'b:11-15'
      |           WHEN activation <= 20 THEN 'c:16-20'
      |           ELSE 'd:21+' END AS bucket,
      |    w4 > 0 AS retained
      |  FROM sc)
      |SELECT bucket, count(*) AS n_users,
      |  CAST(count_if(retained) AS BIGINT) AS n_retained_w4,
      |  CAST(count_if(retained) * 1000000 // count(*) AS BIGINT)
      |    AS retention_ppm
      |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin

  // --- Returns at risk (q184) ---------------------------------------------

  /** q184: RETURNS ANALYSIS — per brand: return-flagged line share in
    * ppm and the revenue it puts at risk, ranked worst-first — the
    * quality-escape table merchandising reads next to q174's discount
    * lift. Exact centi-cent revenue split by flag in ONE conditional
    * aggregate (no second scan, no pivot); ordering total on
    * (return_ppm DESC, brand).
    *
    * Scale shape: lineitem⋈part partkey equi-join, one map-combinable
    * rollup to |brands| rows.
    */
  def q184Returns(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .select(col("l_partkey"), (col("l_returnflag") === "R").as("ret"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .join(part(s, d).select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        count_if(col("ret")).as("n_returned"),
        sum(when(col("ret"), col("cents")).otherwise(lit(0L)))
          .as("returned_cents"),
        sum(col("cents")).as("total_cents"))
      .withColumn("return_ppm", expr("n_returned * 1000000 DIV n_lines"))
      .withColumn("revenue_at_risk_ppm", expr(
        "CAST(CAST(returned_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV total_cents AS BIGINT)"))
      .select(col("p_brand"), col("n_lines"), col("n_returned"),
        col("return_ppm"), col("returned_cents"), col("total_cents"),
        col("revenue_at_risk_ppm"))
      .orderBy(col("return_ppm").desc, col("p_brand"))
  }

  val q184Oracle: String =
    """SELECT p.p_brand, count(*) AS n_lines,
      |  CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS n_returned,
      |  CAST(count_if(l.l_returnflag = 'R') * 1000000 // count(*)
      |    AS BIGINT) AS return_ppm,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS returned_cents,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT) AS total_cents,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |      THEN CAST(round(l.l_extendedprice * 100) AS HUGEINT)
      |      ELSE 0 END) * 1000000
      |    // sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT))
      |    AS BIGINT) AS revenue_at_risk_ppm
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |GROUP BY 1 ORDER BY return_ppm DESC, p_brand""".stripMargin

  // --- Rapid-repeat-order velocity audit (q185) ---------------------------

  private val RapidWindowDays = 7

  /** q185: ORDER VELOCITY — same-customer order pairs placed within
    * [[RapidWindowDays]] days: the card-testing / double-submit
    * signature a payments-risk audit runs (exact-amount dup detection
    * degenerates on this fixture's continuous prices — the VELOCITY
    * variant is the same pair-audit shape with a live result). Pairs
    * are customer-blocked (the q173 inverted-index discipline: the
    * self-join is Σ|per-customer orders|², never orders², and the
    * per-customer order count is naturally bounded), ordered
    * (ok_a < ok_b) so each pair reports once; per flagged customer:
    * pair count, tightest gap, and the flagged order volume.
    *
    * Scale shape: one orders scan, self-join on the custkey exchange
    * (reused both sides), day-window filter, customer-grain rollup
    * ordered (n_pairs DESC, cust).
    */
  def q185RapidRepeat(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(col("o_custkey").as("cust"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderkey").as("ok"), to_date(col("o_orderdate")).as("day"))
    o.select(col("cust"), col("cents").as("ca"), col("ok").as("ok_a"),
        col("day").as("day_a"))
      .join(o.select(col("cust"), col("cents").as("cb"),
        col("ok").as("ok_b"), col("day").as("day_b")), Seq("cust"))
      .filter(col("ok_a") < col("ok_b") &&
        abs(datediff(col("day_b"), col("day_a"))) <= RapidWindowDays)
      .groupBy("cust")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(datediff(col("day_b"), col("day_a")))).cast("long")
          .as("min_gap_days"),
        sum(col("ca") + col("cb")).as("flagged_cents"))
      .orderBy(col("n_pairs").desc, col("cust"))
  }

  val q185Oracle: String =
    s"""WITH o AS (
       |  SELECT o_custkey AS cust,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    o_orderkey AS ok, CAST(o_orderdate AS DATE) AS d
       |  FROM orders),
       |p AS (
       |  SELECT a.cust, a.cents AS ca, b.cents AS cb,
       |    abs(date_diff('day', a.d, b.d)) AS gap
       |  FROM o a JOIN o b ON a.cust = b.cust AND a.ok < b.ok
       |    AND abs(date_diff('day', a.d, b.d)) <= $RapidWindowDays)
       |SELECT cust, count(*) AS n_pairs,
       |  CAST(min(gap) AS BIGINT) AS min_gap_days,
       |  CAST(sum(ca + cb) AS BIGINT) AS flagged_cents
       |FROM p GROUP BY 1 ORDER BY n_pairs DESC, cust""".stripMargin

  // --- Unit-price consistency (q186) --------------------------------------

  /** q186: PRICE CONSISTENCY — the same part sold at different
    * effective unit prices is either discount policy or a pricing bug;
    * per brand: parts audited, parts with > 2× unit-price spread, and
    * the worst spread in ppm. Unit price is the DEFINED floor
    * round(price·100)·100 DIV qty (centi-cents per unit — exact,
    * engine-identical; a double division would hash-diverge), spread =
    * (max − min)·10⁶ DIV min over each part's lines. Top spread per
    * brand ties to the smallest partkey.
    *
    * Scale shape: lineitem → per-part min/max unit price (partkey
    * rollup, map-combinable), part⋈brand attach, |brands| rows out.
    */
  def q186PriceSpread(s: SparkSession, d: String): DataFrame = {
    val wB = Window.partitionBy("p_brand")
    val perPart = lineitem(s, d)
      .select(col("l_partkey"), expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) * 100" +
          " DIV CAST(l_quantity AS BIGINT)").as("ucc"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_lines"), min(col("ucc")).as("lo"),
        max(col("ucc")).as("hi"))
      .withColumn("spread_ppm", expr(
        "CASE WHEN lo > 0 THEN (hi - lo) * 1000000 DIV lo END"))
    perPart
      .join(part(s, d).select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .withColumn("ws", max(col("spread_ppm")).over(wB))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        count_if(col("spread_ppm") > 1000000L).as("n_over_2x"),
        max(col("spread_ppm")).as("worst_spread_ppm"),
        min(when(col("spread_ppm") === col("ws"), col("l_partkey")))
          .as("worst_part"))
      .orderBy("p_brand")
  }

  val q186Oracle: String =
    """WITH pp AS (
      |  SELECT l_partkey, count(*) AS n_lines,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT) * 100
      |      // CAST(l_quantity AS BIGINT)) AS lo,
      |    max(CAST(round(l_extendedprice * 100) AS BIGINT) * 100
      |      // CAST(l_quantity AS BIGINT)) AS hi
      |  FROM lineitem GROUP BY 1),
      |sp AS (
      |  SELECT l_partkey, n_lines, lo, hi,
      |    CASE WHEN lo > 0 THEN (hi - lo) * 1000000 // lo END AS spread_ppm
      |  FROM pp),
      |j AS (
      |  SELECT p.p_brand, sp.l_partkey, sp.spread_ppm,
      |    max(sp.spread_ppm) OVER (PARTITION BY p.p_brand) AS ws
      |  FROM sp JOIN part p ON p.p_partkey = sp.l_partkey)
      |SELECT p_brand, count(*) AS n_parts,
      |  CAST(count_if(spread_ppm > 1000000) AS BIGINT) AS n_over_2x,
      |  CAST(max(spread_ppm) AS BIGINT) AS worst_spread_ppm,
      |  min(CASE WHEN spread_ppm = ws THEN l_partkey END) AS worst_part
      |FROM j GROUP BY 1 ORDER BY p_brand""".stripMargin

  // --- ABC / Pareto classification (q189) ---------------------------------

  /** q189: ABC CLASSES — inventory's Pareto cut: parts ranked by
    * revenue, class A = the head covering the first 80% of revenue,
    * B the next 15%, C the tail — the classification that decides
    * cycle-count frequency and safety stock. Class boundaries are
    * EXACT threshold splits on the cumulative revenue of the
    * (revenue-value) HISTOGRAM, descending — the q145/q155 tie-block
    * discipline: a block of parts with identical revenue straddling a
    * boundary is split by COUNT, never by an arbitrary per-part rank,
    * so no global per-part sort exists anywhere (at 10⁹ parts a
    * row-rank window would be a single-task sort; the distinct-revenue
    * frame is value-domain-bounded).
    *
    * Per class: parts, revenue cents, revenue share ppm, part share
    * ppm — the "80% of revenue in 12% of parts" readout.
    */
  def q189AbcClasses(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
    val wCum = wAll.orderBy(col("rev").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = lineitem(s, d)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .groupBy("l_partkey").agg(sum(col("cents")).as("rev"))
      .groupBy("rev").agg(count(lit(1)).as("m"))
      .withColumn("t", sum(expr("rev * m")).over(wAll))
      .withColumn("np", sum(col("m")).over(wAll))
      .withColumn("above", coalesce(sum(expr("rev * m")).over(wCum), lit(0L)))
    // a revenue block [above, above + rev·m) is split across the 80/95
    // boundaries by COUNT: parts_in(lo, hi) = clamp((hi−above) div rev)
    def take(hiExpr: String): Column = expr(
      s"""greatest(0L, least(CAST(m AS BIGINT),
         |  CASE WHEN rev > 0 THEN (($hiExpr) - above + rev - 1) DIV rev
         |       ELSE 0L END))""".stripMargin)
    hist
      .withColumn("inA", take("t * 80 DIV 100"))
      .withColumn("inAB", take("t * 95 DIV 100"))
      .withColumn("cls", explode(expr("array('A', 'B', 'C')")))
      .withColumn("n_parts", expr(
        """CASE cls WHEN 'A' THEN inA WHEN 'B' THEN inAB - inA
          |     ELSE m - inAB END""".stripMargin))
      .withColumn("rev_cents", expr("n_parts * rev"))
      .groupBy("cls")
      .agg(sum(col("n_parts")).as("n_parts"),
        sum(col("rev_cents")).as("revenue_cents"),
        max(col("t")).as("t"), max(col("np")).as("np"))
      .withColumn("revenue_share_ppm", expr(
        "CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000000 DIV t" +
          " AS BIGINT)"))
      .withColumn("part_share_ppm", expr("n_parts * 1000000 DIV np"))
      .select(col("cls"), col("n_parts"), col("revenue_cents"),
        col("revenue_share_ppm"), col("part_share_ppm"))
      .orderBy("cls")
  }

  val q189Oracle: String =
    """WITH pr AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev
      |  FROM lineitem GROUP BY 1),
      |h AS (SELECT rev, count(*) AS m FROM pr GROUP BY 1),
      |w AS (
      |  SELECT rev, m, sum(rev * m) OVER () AS t, sum(m) OVER () AS np,
      |    coalesce(sum(rev * m) OVER (ORDER BY rev DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      |  FROM h),
      |x AS (
      |  SELECT rev, m, t, np, above,
      |    greatest(0, least(m, CASE WHEN rev > 0
      |      THEN (t * 80 // 100 - above + rev - 1) // rev ELSE 0 END))
      |      AS inA,
      |    greatest(0, least(m, CASE WHEN rev > 0
      |      THEN (t * 95 // 100 - above + rev - 1) // rev ELSE 0 END))
      |      AS inAB
      |  FROM w),
      |e AS (
      |  SELECT cls,
      |    CASE cls WHEN 'A' THEN inA WHEN 'B' THEN inAB - inA
      |         ELSE m - inAB END AS n_parts,
      |    rev, t, np
      |  FROM x CROSS JOIN (VALUES ('A'), ('B'), ('C')) c(cls)),
      |g AS (
      |  SELECT cls, sum(n_parts) AS n_parts,
      |    sum(n_parts * rev) AS revenue_cents, max(t) AS t, max(np) AS np
      |  FROM e GROUP BY 1)
      |SELECT cls, CAST(n_parts AS BIGINT) AS n_parts,
      |  CAST(revenue_cents AS BIGINT) AS revenue_cents,
      |  CAST(revenue_cents * 1000000 // t AS BIGINT) AS revenue_share_ppm,
      |  CAST(n_parts * 1000000 // np AS BIGINT) AS part_share_ppm
      |FROM g ORDER BY cls""".stripMargin

  // --- SLO burn rate (q190) -----------------------------------------------

  private val SloErrPpm = 210000L

  /** q190: SLO BURN — the SRE error-budget table: per day, the error
    * share of events in exact ppm, the trailing-7-day share (CALENDAR
    * range window, the q171 discipline — gaps contribute nothing), and
    * both expressed as burn rates in milli against a literal
    * [[SloErrPpm]] objective: burn > 1000 milli means the budget is
    * being consumed faster than the SLO allows, the fast-burn/slow-burn
    * pair every multiwindow alert policy (SRE workbook ch. 5) pages on.
    * All-integer: shares are count ratios, burns are ppm DIV ppm.
    *
    * Scale shape: one events scan → (day) counts frame; both windows
    * ride the bounded day frame.
    */
  def q190SloBurn(s: SparkSession, d: String): DataFrame = {
    val w7 = Window.partitionBy(lit(1)).orderBy("ed").rangeBetween(-6, 0)
    events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        count_if(col("event_type") === "error").as("errs"))
      .withColumn("ed", expr("datediff(day, DATE '1970-01-01')"))
      .withColumn("n7", sum(col("n")).over(w7))
      .withColumn("errs7", sum(col("errs")).over(w7))
      .withColumn("err_ppm_1d", expr("errs * 1000000 DIV n"))
      .withColumn("err_ppm_7d", expr("errs7 * 1000000 DIV n7"))
      .withColumn("burn_1d_milli",
        expr(s"err_ppm_1d * 1000 DIV $SloErrPpm"))
      .withColumn("burn_7d_milli",
        expr(s"err_ppm_7d * 1000 DIV $SloErrPpm"))
      .select(col("day"), col("n"), col("errs"), col("err_ppm_1d"),
        col("err_ppm_7d"), col("burn_1d_milli"), col("burn_7d_milli"))
      .orderBy("day")
  }

  val q190Oracle: String =
    s"""WITH dd AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
       |    count_if(event_type = 'error') AS errs
       |  FROM events GROUP BY 1),
       |w AS (
       |  SELECT day, n, errs,
       |    sum(n) OVER (ORDER BY date_diff('day', DATE '1970-01-01', day)
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7,
       |    sum(errs) OVER (ORDER BY
       |        date_diff('day', DATE '1970-01-01', day)
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS errs7
       |  FROM dd)
       |SELECT day, n, CAST(errs AS BIGINT) AS errs,
       |  CAST(errs * 1000000 // n AS BIGINT) AS err_ppm_1d,
       |  CAST(errs7 * 1000000 // n7 AS BIGINT) AS err_ppm_7d,
       |  CAST(errs * 1000000 // n * 1000 // $SloErrPpm AS BIGINT)
       |    AS burn_1d_milli,
       |  CAST(errs7 * 1000000 // n7 * 1000 // $SloErrPpm AS BIGINT)
       |    AS burn_7d_milli
       |FROM w ORDER BY day""".stripMargin

  // --- Two-proportion A/B readout (q191) ----------------------------------

  /** q191: A/B READOUT — the two-proportion experiment table: users
    * split into arms by id parity (the q149 deterministic split), the
    * metric is user-level purchase conversion, and significance is the
    * EXACT pooled two-proportion z² in milli — z² reduces to one
    * integer fraction, (c₁n₂ − c₂n₁)²·N / (n₁·n₂·C·(N−C)) with
    * C = c₁+c₂, N = n₁+n₂, evaluated on decimal(38,0)/HUGEINT and
    * floored once (z² ≥ 3.84 ⇔ p < .05 two-sided ⇔ z2_milli ≥ 3841-ish
    * — the experimenter's line). Exact while (c₁n₂−c₂n₁)²·N fits 38
    * digits — arms to ~3·10⁷ users; beyond that an experiment
    * subsamples anyway. No float anywhere: rates and diff in exact ppm.
    *
    * Scale shape: one events scan → per-user converted flag (user-keyed,
    * map-combinable) → two-arm rollup → one literal row.
    */
  def q191AbTest(s: SparkSession, d: String): DataFrame = {
    def big(c: Column): Column = c.cast("decimal(38,0)")
    val arms = events(s, d)
      .groupBy(col("user_id"))
      .agg(count_if(col("event_type") === "purchase").as("purchases"))
      .withColumn("arm", when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"),
        count_if(col("purchases") > 0).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // A degenerate assignment (an arm with no users — a filtered fixture,
    // or every user_id sharing parity) degrades to a NULL row exactly as
    // the oracle's max(CASE...) pivot does, instead of crashing.
    val a = arms.get("A"); val b = arms.get("B")
    def ratePpm(arm: Option[(Long, Long)]): Option[Long] =
      arm.collect { case (n, c) if n > 0 => c * 1000000L / n }
    val z2Milli = for {
      (n1, c1) <- a
      (n2, c2) <- b
      nn = BigInt(n1) + n2
      cc = BigInt(c1) + c2
      den = BigInt(n1) * n2 * cc * (nn - cc)
      if den > 0
      dNum = BigInt(c1) * n2 - BigInt(c2) * n1
    } yield (dNum * dNum * nn * 1000 / den).toLong
    import s.implicits._
    Seq((a.map(_._1), a.map(_._2), b.map(_._1), b.map(_._2),
      ratePpm(a), ratePpm(b),
      for { ra <- ratePpm(a); rb <- ratePpm(b) } yield ra - rb, z2Milli))
      .toDF("n_a", "conv_a", "n_b", "conv_b", "rate_a_ppm", "rate_b_ppm",
        "diff_ppm", "z2_milli")
  }

  val q191Oracle: String =
    """WITH u AS (
      |  SELECT user_id, count_if(event_type = 'purchase') AS p
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    count(*) AS n, count_if(p > 0) AS c
      |  FROM u GROUP BY 1),
      |w AS (
      |  SELECT max(CASE WHEN arm = 'A' THEN n END) AS n1,
      |    max(CASE WHEN arm = 'A' THEN c END) AS c1,
      |    max(CASE WHEN arm = 'B' THEN n END) AS n2,
      |    max(CASE WHEN arm = 'B' THEN c END) AS c2
      |  FROM a)
      |SELECT CAST(n1 AS BIGINT) AS n_a, CAST(c1 AS BIGINT) AS conv_a,
      |  CAST(n2 AS BIGINT) AS n_b, CAST(c2 AS BIGINT) AS conv_b,
      |  CAST(c1 * 1000000 // n1 AS BIGINT) AS rate_a_ppm,
      |  CAST(c2 * 1000000 // n2 AS BIGINT) AS rate_b_ppm,
      |  CAST(c1 * 1000000 // n1 - c2 * 1000000 // n2 AS BIGINT)
      |    AS diff_ppm,
      |  CAST(CASE WHEN n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2) > 0
      |    THEN CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1 END
      |    * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
      |    * (n1 + n2) * 1000
      |    // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2) * (n1 + n2 - c1 - c2))
      |    AS BIGINT) AS z2_milli
      |FROM w""".stripMargin

  // --- Per-item "also bought" recs (q192) ---------------------------------

  private val AlsoHeadParts = 10
  private val AlsoTopK = 3

  /** q192: ALSO-BOUGHT TABLE — the per-item production artifact q164's
    * global rule list feeds: for each of the [[AlsoHeadParts]]
    * highest-support parts, its [[AlsoTopK]] strongest co-purchase
    * partners by lift. Head parts come off the support histogram
    * (bucket-prefiltered rank, q68 discipline); the pair frame is
    * q164's a-priori-pruned basket self-join REUSED semantically but
    * restricted by a broadcast head-part semi-join BEFORE pairing —
    * the anchor side of every generated pair is a head part, so the
    * pair space is |head|·|basket| not |basket|². Per anchor, the
    * partner rank window is anchor-partitioned (never global).
    */
  def q192AlsoBought(s: SparkSession, d: String): DataFrame = {
    val items = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item"))
      .distinct()
      .localCheckpoint(eager = true)
    val n = items.select(countDistinct(col("o")).as("n"))
      .collect().head.getLong(0)
    val sup = items.groupBy("item").agg(count(lit(1)).as("sup"))
      .localCheckpoint(eager = true)
    val ordH = Seq(col("sup").desc, col("item").asc)
    val wHb = Window.partitionBy("__b").orderBy(ordH: _*)
    val wHg = Window.partitionBy(lit(1)).orderBy(ordH: _*)
    val heads = sup
      .withColumn("__b", pmod(xxhash64(col("item")), lit(64)))
      .withColumn("__r", row_number().over(wHb))
      .filter(col("__r") <= AlsoHeadParts)
      .withColumn("__g", row_number().over(wHg))
      .filter(col("__g") <= AlsoHeadParts)
      .select(col("item").as("anchor"), col("sup").as("sup_a"))
    val anchored = items.join(broadcast(heads),
      col("item") === col("anchor"))
      .select(col("o"), col("anchor"), col("sup_a"))
    val pairs = anchored
      .join(items.select(col("o"), col("item").as("partner")), Seq("o"))
      .filter(col("partner") =!= col("anchor"))
      .groupBy("anchor", "sup_a", "partner")
      .agg(count(lit(1)).as("sup_ap"))
      .join(sup.select(col("item").as("partner"), col("sup").as("sup_p")),
        Seq("partner"))
      .withColumn("lift_ppm", expr(
        s"CAST(sup_ap AS DECIMAL(38,0)) * CAST($n AS DECIMAL(38,0))" +
          " * 1000000 DIV (CAST(sup_a AS DECIMAL(38,0)) * sup_p)"))
    val wA = Window.partitionBy("anchor")
      .orderBy(col("lift_ppm").desc, col("partner").asc)
    pairs
      .withColumn("rank", row_number().over(wA).cast("long"))
      .filter(col("rank") <= AlsoTopK)
      .select(col("anchor"), col("sup_a"), col("rank"), col("partner"),
        col("sup_p"), col("sup_ap"), col("lift_ppm"))
      .orderBy("anchor", "rank")
  }

  val q192Oracle: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
       |nb AS (SELECT count(DISTINCT o) AS n FROM items),
       |sup AS (SELECT item, count(*) AS sup FROM items GROUP BY 1),
       |heads AS (
       |  SELECT item AS anchor, sup AS sup_a,
       |    row_number() OVER (ORDER BY sup DESC, item) AS r
       |  FROM sup QUALIFY r <= $AlsoHeadParts),
       |p AS (
       |  SELECT h.anchor, h.sup_a, b.item AS partner, count(*) AS sup_ap
       |  FROM items a
       |  JOIN heads h ON h.anchor = a.item
       |  JOIN items b ON b.o = a.o AND b.item <> a.item
       |  GROUP BY 1, 2, 3),
       |m AS (
       |  SELECT p.*, s.sup AS sup_p,
       |    CAST(CAST(p.sup_ap AS HUGEINT) * (SELECT n FROM nb) * 1000000
       |      // (CAST(p.sup_a AS HUGEINT) * s.sup) AS BIGINT) AS lift_ppm
       |  FROM p JOIN sup s ON s.item = p.partner),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY anchor
       |    ORDER BY lift_ppm DESC, partner) AS rank
       |  FROM m)
       |SELECT anchor, CAST(sup_a AS BIGINT) AS sup_a,
       |  CAST(rank AS BIGINT) AS rank, partner,
       |  CAST(sup_p AS BIGINT) AS sup_p, CAST(sup_ap AS BIGINT) AS sup_ap,
       |  lift_ppm
       |FROM r WHERE rank <= $AlsoTopK ORDER BY anchor, rank""".stripMargin

  // --- Window→agg-join rewrite, end-to-end (q197) --------------------------

  /** q197: WHOLE-PARTITION WINDOW VIA THE REWRITE RULE — per-line order
    * shape (line quantity, the order's total quantity and line count,
    * and each line's integer ppm share) where the window aggregates run
    * THROUGH [[graft.rules.WindowToAggJoin.rewrite]], applied to this
    * one plan explicitly rather than via the session-wide config gate.
    *
    * The oracle is the plain `SUM(...) OVER (PARTITION BY ...)` SQL, so
    * the driver gate certifies the rule is value-preserving end-to-end
    * on real data — not just in its unit spec. ConnectorsSpec pins that
    * the registered plan really carries the rewrite (no Window node; a
    * pre-aggregate join instead).
    *
    * Scale: this is the rule's whole point — the corpus-wide sort that
    * WindowExec would run on a fact table disappears; the join side is
    * |orders|-sized and collapses map-side before the exchange.
    */
  def q197WindowRewrite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    // BOTH window aggregates in ONE select: chained withColumns would
    // analyze into two stacked Window nodes and the rewrite (applied on
    // the analyzed plan, before CollapseWindow) would build two joins —
    // one select keeps a single Window, hence ONE pre-aggregate join
    val base = lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .select(col("*"),
        sum(col("qty")).over(w).as("qty_total"),
        count(lit(1)).over(w).as("n_lines"))
      .withColumn("qty_share_ppm", expr("qty * 1000000 DIV qty_total"))
      // the synthetic lineitem is NOT unique on (orderkey, linenumber);
      // qty in the sort makes ties fully-identical rows
      .orderBy("l_orderkey", "l_linenumber", "qty")
    org.apache.spark.sql.GraftColumnBridge.ofRows(s,
      graft.rules.WindowToAggJoin.rewrite(base.queryExecution.analyzed))
  }

  val q197Oracle: String =
    """WITH l AS (
      |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, qty,
      |  CAST(sum(qty) OVER (PARTITION BY l_orderkey) AS BIGINT) AS qty_total,
      |  count(*) OVER (PARTITION BY l_orderkey) AS n_lines,
      |  CAST(qty * 1000000
      |    // sum(qty) OVER (PARTITION BY l_orderkey) AS BIGINT)
      |    AS qty_share_ppm
      |FROM l ORDER BY l_orderkey, l_linenumber, qty""".stripMargin

  // --- Recursive CTE (q223) -------------------------------------------------

  /** q223: RECURSIVE CTE — `WITH RECURSIVE` through Spark 4's native
    * UnionLoop execution (iterated join-until-empty, each level one
    * distributed join; the recursion is DATA-DEPENDENT so no closed
    * form exists): every customer walks UP the implicit approval
    * hierarchy `parent(k) = k div 2` and STOPS at the first ancestor
    * with a negative account balance (a blocked approver) or at the
    * root — the escalation-path audit shape (how deep do approval
    * chains run before hitting a blocked node?). The walk carries
    * (cur, steps, blocked); a level's WHERE prunes finished walks, so
    * the iteration's frontier only shrinks. Output: walks per
    * (stop-depth, blocked) cell.
    *
    * Scale shape: level count is log₂(max key) — each iteration is one
    * shuffled join of the shrinking frontier against the customer dim;
    * no driver-side looping, the plan IS the loop (UnionLoop), and the
    * frontier is hash-partitioned like any join. DuckDB runs the
    * textbook WITH RECURSIVE twin — same fixpoint semantics, so the
    * gate certifies level-by-level agreement.
    */
  def q223RecursiveCte(s: SparkSession, d: String): DataFrame = {
    customer(s, d).select("c_custkey", "c_acctbal")
      .createOrReplaceTempView("q223_customer")
    s.sql(
      """WITH RECURSIVE walk(start_id, cur, steps, blocked) AS (
        |  SELECT c_custkey, c_custkey, 0, FALSE FROM q223_customer
        |  UNION ALL
        |  SELECT w.start_id, p.c_custkey, w.steps + 1, p.c_acctbal < 0
        |  FROM walk w JOIN q223_customer p ON p.c_custkey = w.cur DIV 2
        |  WHERE w.cur > 1 AND NOT w.blocked
        |)
        |SELECT CAST(steps AS BIGINT) AS stop_depth, blocked,
        |  count(*) AS n_walks,
        |  CAST(min(start_id) AS BIGINT) AS min_start,
        |  CAST(max(start_id) AS BIGINT) AS max_start
        |FROM walk WHERE blocked OR cur <= 1
        |GROUP BY steps, blocked
        |ORDER BY stop_depth, blocked""".stripMargin)
  }

  /** q225: LATERAL correlated subquery — the per-row subquery surface
    * (`FROM dim, LATERAL (SELECT … WHERE fact.key = dim.key ORDER BY …
    * LIMIT k)`) certified against DuckDB's identical SQL. The naive
    * reading is a nested loop (re-run the subquery per outer row);
    * Spark DECORRELATES it — the correlated LIMIT becomes a
    * row_number window partitioned by the correlation key, one
    * shuffled pass over the fact side, then a join back to the dim —
    * so the declared-per-row semantics execute set-at-a-time (the
    * reason LATERAL is safe to offer at 100 TB at all; the gate
    * certifies the rewrite preserved semantics, ties included via the
    * total (bal DESC, id) order).
    */
  def q225Lateral(s: SparkSession, d: String): DataFrame = {
    customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      col("c_acctbal")).createOrReplaceTempView("q225_customer")
    nation(s, d).select(col("n_nationkey"), col("n_name"))
      .createOrReplaceTempView("q225_nation")
    s.sql(
      """SELECT n.n_name, t.id, t.bal
        |FROM q225_nation n,
        |LATERAL (
        |  SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS bal
        |  FROM q225_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 3
        |) t
        |ORDER BY n.n_name, t.bal DESC, t.id""".stripMargin)
  }

  val q225Oracle: String =
    """SELECT n.n_name, t.id, t.bal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS bal
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 3
      |) t
      |ORDER BY n.n_name, t.bal DESC, t.id""".stripMargin

  /** q235: CORRELATED SUBQUERIES — the three remaining SQL subquery
    * forms beside q225's LATERAL, in one certified statement: a
    * correlated SCALAR subquery in the SELECT list (per-customer order
    * count), a correlated EXISTS predicate (has a high-value order),
    * and a correlated NOT EXISTS (never cancelled an urgent order).
    * Spark DECORRELATES all three — the scalar becomes an aggregate +
    * left outer join, EXISTS a left semi join, NOT EXISTS a left anti
    * join — so the declared-per-row semantics execute as three
    * set-at-a-time joins over ONE orders table (no per-row re-
    * execution anywhere; the same argument as q225, for predicate and
    * scalar positions). COUNT-over-empty must surface as 0, not NULL —
    * the classic COUNT-bug of naive decorrelation, which the
    * cross-engine gate would expose on every order-less customer.
    */
  def q235Subqueries(s: SparkSession, d: String): DataFrame = {
    customer(s, d).select("c_custkey", "c_acctbal")
      .createOrReplaceTempView("q235_customer")
    orders(s, d).select("o_custkey", "o_totalprice", "o_orderstatus",
      "o_orderpriority").createOrReplaceTempView("q235_orders")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM q235_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM q235_customer c
        |WHERE EXISTS (SELECT 1 FROM q235_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM q235_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  val q235Oracle: String =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 200000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F'
      |                    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** q236: IN / NOT IN SUBQUERY NULL SEMANTICS — the classic
    * three-valued-logic trap, certified cross-engine in one row:
    * `x NOT IN (subquery)` is `NOT(x = a OR x = b OR …)`, so a single
    * NULL in the subquery makes every comparison UNKNOWN and the
    * predicate filters EVERYTHING — the silent-empty-result bug that
    * has burned every SQL user once. The registered row carries four
    * counts: IN, NOT IN against a null-free list, NOT IN against the
    * SAME list with NULLs injected (must be 0 in BOTH engines — an
    * engine "helpfully" ignoring the NULLs would mismatch here), and
    * the customer total (so `n_in + n_not_in_clean = n_customers` is
    * visible in the data). Spark plans IN as a left semi join and the
    * null-aware NOT IN as the special null-aware anti join — the
    * reason NOT IN on a possibly-null column is a scale hazard worth
    * certifying, not just documenting.
    */
  def q236NotInNull(s: SparkSession, d: String): DataFrame = {
    customer(s, d).select("c_custkey")
      .createOrReplaceTempView("q236_customer")
    orders(s, d).select("o_custkey", "o_totalprice")
      .createOrReplaceTempView("q236_orders")
    s.sql(
      """SELECT
        |  (SELECT count(*) FROM q236_customer WHERE c_custkey IN
        |    (SELECT o_custkey FROM q236_orders WHERE o_totalprice > 100000))
        |    AS n_in,
        |  (SELECT count(*) FROM q236_customer WHERE c_custkey NOT IN
        |    (SELECT o_custkey FROM q236_orders WHERE o_totalprice > 100000))
        |    AS n_not_in_clean,
        |  (SELECT count(*) FROM q236_customer WHERE c_custkey NOT IN
        |    (SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
        |     FROM q236_orders))
        |    AS n_not_in_poisoned,
        |  (SELECT count(*) FROM q236_customer) AS n_customers""".stripMargin)
  }

  val q236Oracle: String =
    """SELECT
      |  (SELECT count(*) FROM customer WHERE c_custkey IN
      |    (SELECT o_custkey FROM orders WHERE o_totalprice > 100000))
      |    AS n_in,
      |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
      |    (SELECT o_custkey FROM orders WHERE o_totalprice > 100000))
      |    AS n_not_in_clean,
      |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
      |    (SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
      |     FROM orders))
      |    AS n_not_in_poisoned,
      |  (SELECT count(*) FROM customer) AS n_customers""".stripMargin

  val q223Oracle: String =
    """WITH RECURSIVE walk(start_id, cur, steps, blocked) AS (
      |  SELECT c_custkey, c_custkey, 0, FALSE FROM customer
      |  UNION ALL
      |  SELECT w.start_id, p.c_custkey, w.steps + 1, p.c_acctbal < 0
      |  FROM walk w JOIN customer p ON p.c_custkey = w.cur // 2
      |  WHERE w.cur > 1 AND NOT w.blocked
      |)
      |SELECT CAST(steps AS BIGINT) AS stop_depth, blocked,
      |  count(*) AS n_walks,
      |  CAST(min(start_id) AS BIGINT) AS min_start,
      |  CAST(max(start_id) AS BIGINT) AS max_start
      |FROM walk WHERE blocked OR cur <= 1
      |GROUP BY steps, blocked
      |ORDER BY stop_depth, blocked""".stripMargin
}
