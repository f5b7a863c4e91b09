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
}
