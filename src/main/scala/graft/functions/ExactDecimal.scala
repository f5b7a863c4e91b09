package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Exact decimal(·,6) summation at primitive-long speed.
  *
  * Motivation (round-3 verdict, q10): `sum(CAST(x AS DECIMAL(18,6)))` costs
  * ~450 ns/row — `BigDecimal.valueOf(double)` goes through `Double.toString`
  * and the sum's decimal(28,6) buffer falls off the compact-long path, so
  * every partial update allocates. Nine such moments over one input split
  * made q10 the slowest query in the suite.
  *
  * The replacement: [[ExactDecimal.ScaledLong]] converts a double to the
  * UNSCALED long of `CAST(x AS DECIMAL(·, scale))` — HALF_UP rounding of
  * the exact binary value — using only the IEEE-754
  * mantissa/exponent decomposition and 128-bit integer shifts (no
  * BigDecimal, no string). Summation then happens as plain `sum(long)`
  * (codegen'd primitive buffer), split into hi/lo halves at 2^27 so the
  * partials cannot overflow: with per-row |scaled| ≤ 1.2e16 the hi sum
  * stays under 2^63 up to ~6e9 rows per group-aggregation — beyond that,
  * pre-aggregate per partition first (the standard two-level pattern).
  * The exact total is recombined in DECIMAL once per GROUP, not per row.
  */
object ExactDecimal {

  /** Bits of the hi/lo split for overflow-safe long partial sums. */
  val SplitShift: Int = 27
  val SplitMask: Long = (1L << SplitShift) - 1

  /** round_half_up(x·pow10) of the EXACT binary value of x, as a long —
    * the unscaled value of the corresponding decimal(·, s) with
    * pow10 = 10^s (s ≤ 12: m·10^s must fit 128 bits).
    *
    * Rounding-semantics note: Spark's CAST(double AS DECIMAL) rounds the
    * SHORTEST-DECIMAL rendering of x (`BigDecimal.valueOf` goes through
    * `Double.toString`), not the exact binary value. The two agree bit-for-
    * bit on any double that round-trips from a decimal with ≤s fractional
    * digits (money columns: the binary error sits orders of magnitude
    * inside the half-grid), and differ by AT MOST one unscaled unit on
    * values that were themselves double-rounded onto an s-th-decimal
    * boundary (e.g. products of money values, where one ulp ≈ the grid
    * step) — both are then valid roundings of a quantity only known to ulp
    * precision. ExactDecimalSpec pins both properties. For RAW money
    * columns the substitution is therefore exact; for double-rounded
    * products use it only where a downstream reduction absorbs the
    * granularity (q10's corr: relative 1e-15 on the co-moment sums).
    *
    * Throws ArithmeticException when the result overflows a long's
    * magnitude (mirrors ANSI overflow rather than silently wrapping);
    * callers guard domain. NaN/Inf are handled by the expression wrapper
    * (→ null, like the non-ANSI cast).
    */
  def compute(x: Double, pow10: Long): Long = {
    if (x == 0.0) return 0L
    val bits = java.lang.Double.doubleToRawLongBits(x)
    val neg = bits < 0
    val rawExp = ((bits >>> 52) & 0x7FFL).toInt
    val frac = bits & 0x000FFFFFFFFFFFFFL
    val m = if (rawExp == 0) frac else frac | 0x0010000000000000L
    val e = if (rawExp == 0) -1074 else rawExp - 1075
    // |x| = m · 2^e. Want round_half_up(m · 2^e · pow10).
    // M = m · pow10 as unsigned 128-bit hi:lo (m < 2^53, pow10 ≤ 10^12 ⇒
    // M < 2^93).
    val lo = m * pow10
    val hi = java.lang.Math.multiplyHigh(m, pow10)
    var q = 0L
    if (e >= 0) {
      // integer-valued double ≥ 2^52: M · 2^e must fit 63 bits
      if (hi != 0 || e >= 63 || (lo >>> (63 - e)) != 0)
        throw new ArithmeticException(s"scaled-long overflow scaling $x")
      q = lo << e
    } else {
      val s = -e
      if (s >= 128) return 0L // |x|·10⁶ < 2^-54 — rounds to zero
      if (s < 64 && (hi >>> s) != 0)
        throw new ArithmeticException(s"scaled-long overflow scaling $x")
      q =
        if (s == 0) lo
        else if (s < 64) (hi << (64 - s)) | (lo >>> s)
        else if (s - 64 < 64) hi >>> (s - 64)
        else 0L
      if (q < 0) throw new ArithmeticException(s"scaled-long overflow scaling $x")
      // HALF_UP on the magnitude: round up iff remainder ≥ half, i.e. bit
      // s-1 of M is set (s ≥ 1 here).
      val rb =
        if (s - 1 < 64) (lo >>> (s - 1)) & 1L
        else if (s - 1 - 64 < 64) (hi >>> (s - 1 - 64)) & 1L
        else 0L
      q += rb
      if (q < 0) throw new ArithmeticException(s"scaled-long overflow scaling $x")
    }
    if (neg) -q else q
  }

  /** Convenience for [[compute]] at scale 6 (used by tests/docs). */
  def compute(x: Double): Long = compute(x, 1000000L)

  /** round_half_up(x·10^scale) as LONG — the unscaled value of
    * CAST(x AS DECIMAL(·, scale)). Null/NaN/Inf → null (cast parity);
    * out-of-range → ArithmeticException. Codegen'd: one static call per
    * row, no allocation.
    */
  case class ScaledLong(child: Expression, scale: Int) extends UnaryExpression {

    require(scale >= 0 && scale <= 12, s"scale $scale outside [0, 12]")
    private val pow10: Long = (0 until scale).foldLeft(1L)((a, _) => a * 10)

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "scaled_long"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case DoubleType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires double, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(x)) java.lang.Long.valueOf(compute(x, pow10)) else null
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val code =
        code"""
          ${c.code}
          boolean ${ev.isNull} = true;
          long ${ev.value} = 0L;
          if (!${c.isNull} && java.lang.Double.isFinite(${c.value})) {
            ${ev.isNull} = false;
            ${ev.value} = graft.functions.ExactDecimal.compute(${c.value}, ${pow10}L);
          }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** scaled_long(x, scale) over a double column. */
  def scaled(x: Column, scale: Int): Column =
    GraftColumnBridge.column(ScaledLong(GraftColumnBridge.expression(x), scale))

  /** scaled_long at the money-grade scale 6 (decM parity). */
  def scaled6(x: Column): Column = scaled(x, 6)

  /** The two overflow-safe partial LONG sums (hi/lo at 2^27) of
    * scaled_long(x, scale), aliased `hi_<tag>`/`lo_<tag>` — splice into
    * `.agg(...)` and recombine with [[totalOf]]/[[momentD]].
    */
  def splitSums(x: Column, scale: Int, tag: String): Seq[Column] = {
    import org.apache.spark.sql.functions.{lit, shiftright, sum}
    val v = scaled(x, scale)
    Seq(
      sum(shiftright(v, SplitShift)).as(s"hi_$tag"),
      sum(v.bitwiseAND(lit(SplitMask))).as(s"lo_$tag"))
  }

  /** [[splitSums]] restricted to rows satisfying `cond` — the single-scan
    * conditional-aggregation form of a filtered sum (`sum(CASE WHEN cond
    * THEN x END)`): rows failing (or null on) `cond` contribute NULL,
    * which `sum` skips, and a group with NO qualifying rows yields NULL
    * partials (the same shape a left join against a filtered aggregate
    * produces — callers `coalesce` at recombine time exactly as they
    * would the join's null side).
    */
  def splitSumsWhen(cond: Column, x: Column, scale: Int, tag: String): Seq[Column] = {
    import org.apache.spark.sql.functions.{lit, shiftright, sum, when}
    val v = when(cond, scaled(x, scale))
    Seq(
      sum(shiftright(v, SplitShift)).as(s"hi_$tag"),
      sum(v.bitwiseAND(lit(SplitMask))).as(s"lo_$tag"))
  }

  /** Net-revenue product sums in PURE LONG arithmetic — the fast path for
    * `sum(CAST(price * (1 - disc) AS DECIMAL(18,6)))` when `price` and
    * `disc` are RAW ≤2-decimal money columns (the caller's contract;
    * the fixture property is asserted in ExactDecimalSpec).
    *
    * Why this is bit-equal to the decimal-cast formulation on BOTH
    * engines, even though the product is double-rounded: the exact
    * rational product P·(100−D)·10⁻⁴ has at most FOUR decimals, so its
    * scale-6 decimal representation is exact and sits ≥ 5·10⁻⁷ from any
    * half-grid rounding boundary. The computed double `price*(1-disc)`
    * lies within a few ulps (≈10⁻¹⁰ absolute at 10⁵ magnitude) of that
    * rational — three orders of magnitude inside the boundary margin —
    * so rounding it at scale 6 (whether of the shortest rendering, as
    * Spark's cast does, or of the exact binary, as DuckDB does) always
    * lands on the exact 4-decimal product. Summing the exact unscaled
    * longs is therefore identical to summing the casts, at the cost of
    * two codegen'd scaled_long calls + long multiply per row instead of
    * a string-path decimal conversion (measured: q23 1.56 → ~0.9 s).
    *
    * Recombine with [[totalOf]]`(tag, 4)`. Envelope: per-row unscaled
    * product ≤ 10⁹ (price < 10⁷ cents, factor ≤ 100), so the hi/lo
    * split carries the same ≥10⁹-rows-per-group headroom as
    * [[splitSums]].
    */
  def splitProductSums(price: Column, disc: Column, tag: String): Seq[Column] = {
    import org.apache.spark.sql.functions.{lit, shiftright, sum}
    val prodU = scaled(price, 2) * (lit(100L) - scaled(disc, 2))
    Seq(
      sum(shiftright(prodU, SplitShift)).as(s"hi_$tag"),
      sum(prodU.bitwiseAND(lit(SplitMask))).as(s"lo_$tag"))
  }

  /** Recombine [[splitSums]] partials into the exact DECIMAL total —
    * value-identical to `sum(CAST(x AS DECIMAL(·, scale)))` (over the
    * scaled_long values; see [[compute]] for the cast-semantics caveat on
    * double-rounded inputs). Runs once per GROUP in the post-agg
    * projection: round/divide/cast it exactly as the decimal sum would be.
    */
  def totalOf(tag: String, scale: Int): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    val unscaled = col(s"hi_$tag").cast("decimal(38,0)") * lit(1L << SplitShift) +
      col(s"lo_$tag").cast("decimal(38,0)")
    unscaled * lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale))
  }

  /** [[totalOf]] surfaced as DOUBLE (one correctly-rounded decimal→double
    * conversion of the exact total).
    */
  def momentD(tag: String, scale: Int): Column = totalOf(tag, scale).cast("double")
}
