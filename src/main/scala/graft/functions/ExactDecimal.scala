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
  * The replacement: [[ExactDecimal.ScaledLong6]] converts a double to the
  * UNSCALED long of `CAST(x AS DECIMAL(18,6))` — bit-equal, including
  * HALF_UP rounding of the exact binary value — using only the IEEE-754
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

  /** round_half_up(x·10⁶) of the EXACT binary value of x, as a long.
    *
    * Rounding-semantics note: Spark's CAST(double AS DECIMAL) rounds the
    * SHORTEST-DECIMAL rendering of x (`BigDecimal.valueOf` goes through
    * `Double.toString`), not the exact binary value. The two agree bit-for-
    * bit on any value that is a double-rounded ≤6-decimal number (money
    * columns: the binary error ~1e-11 sits far from the 1e-6 grid), and
    * differ by AT MOST one unscaled unit on values that were themselves
    * double-rounded onto a 6th-decimal boundary (e.g. products of money
    * values, where one ulp ≈ the grid step) — both are then valid roundings
    * of a quantity only known to ulp precision. ExactDecimalSpec pins both
    * properties. Use where a downstream reduction absorbs 1e-6-granularity
    * perturbation (q10's corr: relative 1e-15 on the co-moment sums).
    *
    * Throws ArithmeticException when the result exceeds decimal(18,6)
    * range (mirrors ANSI overflow rather than silently wrapping); callers
    * guard domain. NaN/Inf are handled by the expression wrapper (→ null,
    * like the non-ANSI cast).
    */
  def compute(x: Double): Long = {
    if (x == 0.0) return 0L
    val bits = java.lang.Double.doubleToRawLongBits(x)
    val neg = bits < 0
    val rawExp = ((bits >>> 52) & 0x7FFL).toInt
    val frac = bits & 0x000FFFFFFFFFFFFFL
    val m = if (rawExp == 0) frac else frac | 0x0010000000000000L
    val e = if (rawExp == 0) -1074 else rawExp - 1075
    // |x| = m · 2^e. Want round_half_up(m · 2^e · 10⁶).
    // M = m · 10⁶ as unsigned 128-bit hi:lo (m < 2^53 ⇒ M < 2^73).
    val lo = m * 1000000L
    val hi = java.lang.Math.multiplyHigh(m, 1000000L)
    var q = 0L
    if (e >= 0) {
      // integer-valued double ≥ 2^52: M · 2^e must fit 63 bits
      if (hi != 0 || e >= 63 || (lo >>> (63 - e)) != 0)
        throw new ArithmeticException(s"decimal(18,6) overflow scaling $x")
      q = lo << e
    } else {
      val s = -e
      if (s >= 128) return 0L // |x|·10⁶ < 2^-54 — rounds to zero
      if (s < 64 && (hi >>> s) != 0)
        throw new ArithmeticException(s"decimal(18,6) overflow scaling $x")
      q =
        if (s == 0) lo
        else if (s < 64) (hi << (64 - s)) | (lo >>> s)
        else if (s - 64 < 64) hi >>> (s - 64)
        else 0L
      if (q < 0) throw new ArithmeticException(s"decimal(18,6) overflow scaling $x")
      // HALF_UP on the magnitude: round up iff remainder ≥ half, i.e. bit
      // s-1 of M is set (s ≥ 1 here).
      val rb =
        if (s - 1 < 64) (lo >>> (s - 1)) & 1L
        else if (s - 1 - 64 < 64) (hi >>> (s - 1 - 64)) & 1L
        else 0L
      q += rb
      if (q < 0) throw new ArithmeticException(s"decimal(18,6) overflow scaling $x")
    }
    if (neg) -q else q
  }

  /** round_half_up(x·10⁶) as LONG — the unscaled value of
    * CAST(x AS DECIMAL(18,6)). Null/NaN/Inf → null (cast parity);
    * out-of-range → ArithmeticException. Codegen'd: one static call per
    * row, no allocation.
    */
  case class ScaledLong6(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "scaled_long6"

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
      if (java.lang.Double.isFinite(x)) java.lang.Long.valueOf(compute(x)) else null
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
            ${ev.value} = graft.functions.ExactDecimal.compute(${c.value});
          }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** scaled_long6(x) over a double column. */
  def scaled6(x: Column): Column =
    GraftColumnBridge.column(ScaledLong6(GraftColumnBridge.expression(x)))

  /** Recombine the hi/lo partial LONG sums of scaled_long6 values into the
    * exact decimal total ×10⁻⁶ and surface it as DOUBLE — identical to
    * `CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)` (one correctly-rounded
    * decimal→double conversion of the same exact value). Runs once per
    * GROUP in the post-agg projection.
    */
  def momentD(hiSum: Column, loSum: Column): Column = {
    import org.apache.spark.sql.functions.lit
    ((hiSum.cast("decimal(38,0)") * lit(1L << SplitShift) + loSum.cast("decimal(38,0)"))
      * lit(new java.math.BigDecimal("0.000001"))).cast("double")
  }
}
