package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/text extension surface
  * (SURVEY.md §7.5). A codegen'd `Expression` keeps the hot loop inside
  * whole-stage codegen — no boxing, no UDF serialization — which matters
  * when this runs per candidate pair over billions of rows.
  */
object VectorExpressions {

  /** Cosine similarity between two numeric arrays (float or double
    * elements), computed in double with one sequential pass — the operand
    * order is fixed so results are bitwise-reproducible across engines.
    * Returns null if either input is null or lengths differ.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_similarity"

    @inline private def elemIsFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> inputs, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val af = elemIsFloat(left); val bf = elemIsFloat(right)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        // A null element makes the whole similarity undefined (reading it
        // as 0.0 would silently skew the result).
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val leftGen = left.genCode(ctx)
      val rightGen = right.genCode(ctx)
      val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val a = leftGen.value; val b = rightGen.value
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val hasNull = ctx.freshName("hasNull")
      val code =
        code"""
          ${leftGen.code}
          ${rightGen.code}
          boolean ${ev.isNull} = true;
          double ${ev.value} = 0.0;
          if (!${leftGen.isNull} && !${rightGen.isNull}) {
            int $n = $a.numElements();
            if ($n == $b.numElements()) {
              double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
              boolean ${hasNull} = false;
              for (int $i = 0; $i < $n; $i++) {
                if ($a.isNullAt($i) || $b.isNullAt($i)) { ${hasNull} = true; break; }
                double x = (double) $a.$aGet($i);
                double y = (double) $b.$bGet($i);
                $dot += x * y; $na += x * x; $nb += y * y;
              }
              if (!${hasNull} && $na != 0.0 && $nb != 0.0) {
                ${ev.isNull} = false;
                ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
              }
            }
          }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash over an array<string> of tokens: each token's xxhash64
    * votes ±1 per bit position; the sign of each accumulated vote becomes
    * the output bit. Near-duplicate texts land within a small Hamming
    * distance, so candidates can be found by banding the 64 bits — no
    * pairwise comparison of the corpus (SURVEY.md §7.5 dedup).
    */
  case class SimHash64(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash64"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<string>, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var t = 0
      val n = arr.numElements()
      while (t < n) {
        if (!arr.isNullAt(t)) {
          val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        t += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column-level API --------------------------------------------------

  /** cosine(a, b) over array<float>/array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** simhash64(tokens) over an array<string> column. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}
