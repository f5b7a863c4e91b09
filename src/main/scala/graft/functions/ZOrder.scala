package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) multi-dimensional clustering key — the physical-layout
  * lever behind multi-column data skipping at 100 TB. Sorting a table by
  * ONE key makes that column's per-file min/max ranges tight and every
  * other column's ranges full-width, so predicates on the second column
  * skip nothing. Sorting by the INTERLEAVED bits of two keys bounds BOTH
  * columns' spans per contiguous run: a curve segment covering 1/4^k of
  * the key space touches ~2^-k of each dimension's range, so file-level
  * min/max pruning works for either predicate — the property Delta/
  * Iceberg `OPTIMIZE ZORDER BY` exploits, here as a plain deterministic
  * expression usable in `repartitionByRange`/`sortWithinPartitions`
  * before any parquet write.
  *
  * Reference scope: the reference's warehouse layout clusters the fact on
  * `(market, venue_id, section)` (`scripts/load_to_bq.py:99-102`), which
  * serves only prefix predicates; z-ordering is the standard upgrade when
  * queries filter on non-prefix key subsets.
  *
  * The interleave is pure bit arithmetic on the LOW `bits` bits of each
  * key (higher bits masked off — callers range-bucket or hash wider
  * domains first), codegen'd via a static kernel, null iff an input is
  * null — and exactly reproducible in ANSI SQL (the oracle states the
  * 2·bits shift-and-mask terms generated from the same constant).
  */
object ZOrder {

  /** Interleave the low `bits` bits: x occupies even positions, y odd. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var a = x & mask
    var b = y & mask
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a & 1L) << (2 * i)) | ((b & 1L) << (2 * i + 1))
      a >>>= 1
      b >>>= 1
      i += 1
    }
    out
  }

  /** Inverse of [[interleave]]: (x, y) from a morton code. */
  def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  case class MortonCode(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {

    require(bits >= 1 && bits <= 31, s"bits $bits outside [1, 31]")

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "morton_code"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got (${l.sql}, ${r.sql})")
      }

    override def nullSafeEval(x: Any, y: Any): Any =
      java.lang.Long.valueOf(
        ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.ZOrder.interleave($x, $y, $bits);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** morton_code(x, y, bits) over two long columns. */
  def morton(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(MortonCode(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))

  /** The identical computation as ANSI SQL over column names — generated
    * from the same `bits` constant so engine and oracle cannot drift
    * (the q29/q37 portable-hash pattern).
    */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** HILBERT curve index of (x, y) on the 2^bits × 2^bits grid — the
    * locality upgrade over [[interleave]]: the Hilbert curve is
    * CONTINUOUS (every consecutive curve step moves exactly one cell in
    * exactly one dimension), where the Z curve takes long diagonal
    * jumps at every power-of-two boundary. For a clustered layout that
    * means a contiguous Hilbert run is a genuinely compact 2-D tile,
    * so file min/max spans are tighter for the same run length —
    * which is why newer table formats offer Hilbert beside Z-order.
    *
    * Classic iterative xy2d: per level s (high bit first), the quadrant
    * digit (3·rx)⊕ry scales by s², then the frame flips/rotates into
    * the quadrant's orientation. Intermediate coordinates may leave
    * [0, s) — the masks of later rounds absorb it (two's-complement
    * `&` behaves identically in Java and DuckDB BIGINT, so the
    * generated SQL walks the same trajectory bit for bit).
    */
  def hilbert(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var a = x & mask
    var b = y & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((a & s) > 0) 1L else 0L
      val ry = if ((b & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { a = s - 1 - a; b = s - 1 - b }
        val t = a; a = b; b = t
      }
      s >>= 1
    }
    d
  }

  case class HilbertCode(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {

    require(bits >= 1 && bits <= 31, s"bits $bits outside [1, 31]")

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "hilbert_code"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got (${l.sql}, ${r.sql})")
      }

    override def nullSafeEval(x: Any, y: Any): Any =
      java.lang.Long.valueOf(
        ZOrder.hilbert(x.asInstanceOf[Long], y.asInstanceOf[Long], bits))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.ZOrder.hilbert($x, $y, $bits);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** hilbert_code(x, y, bits) over two long columns. */
  def hilbertCol(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertCode(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))

  /** The identical xy2d walk as a chain of DuckDB CTEs (one `* REPLACE`
    * round per level, high bit first), generated from the same `bits`
    * constant. Input CTE `src` must expose BIGINT columns `$x`/`$y`;
    * the returned text defines CTEs ending in `$out` whose rows carry
    * every `src` column plus the curve index as `$keyCol`. REPLACE
    * expressions evaluate against the INPUT row, so the three state
    * updates of a round all read the previous round's values — exactly
    * the simultaneous assignment the kernel's loop body performs.
    */
  def hilbertSqlCtes(src: String, x: String, y: String, bits: Int,
      out: String, keyCol: String): String = {
    val init = s"${out}_i AS (SELECT *, CAST($x AS BIGINT) AS __hx, " +
      s"CAST($y AS BIGINT) AS __hy, CAST(0 AS BIGINT) AS __hd FROM $src)"
    val rounds = (bits - 1 to 0 by -1).zipWithIndex.map { case (lvl, i) =>
      val s = 1L << lvl
      val prev = if (i == 0) s"${out}_i" else s"${out}_r${i - 1}"
      val digit = s"CASE WHEN (__hx & $s) = 0 AND (__hy & $s) = 0 THEN 0 " +
        s"WHEN (__hx & $s) = 0 THEN 1 " +
        s"WHEN (__hy & $s) = 0 THEN 3 ELSE 2 END"
      s"""${out}_r$i AS (SELECT * REPLACE (
         |    __hd + ${s * s} * ($digit) AS __hd,
         |    CASE WHEN (__hy & $s) = 0 THEN
         |        CASE WHEN (__hx & $s) > 0 THEN ${s - 1} - __hy ELSE __hy END
         |      ELSE __hx END AS __hx,
         |    CASE WHEN (__hy & $s) = 0 THEN
         |        CASE WHEN (__hx & $s) > 0 THEN ${s - 1} - __hx ELSE __hx END
         |      ELSE __hy END AS __hy)
         |  FROM $prev)""".stripMargin
    }
    val fin = s"$out AS (SELECT * EXCLUDE (__hx, __hy, __hd), " +
      s"__hd AS $keyCol FROM ${out}_r${bits - 1})"
    (init +: rounds :+ fin).mkString(",\n")
  }
}
