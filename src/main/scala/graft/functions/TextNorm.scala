package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the first stage of every training-data
  * pipeline (canonically-equivalent byte sequences must hash/dedup/shingle
  * identically: "é" as U+00E9 and as e+U+0301 are the same text but
  * different bytes, so un-normalized corpora leak duplicates past every
  * content-hash dedup in this library).
  */
object TextNorm {

  /** NFC canonical composition via `java.text.Normalizer` — the JDK
    * implements the same Unicode normalization standard DuckDB's
    * utf8proc-backed `nfc_normalize` does, so the op is oracle-checkable.
    * Codegen'd as one static call per row; already-NFC text (ASCII fast
    * path inside the JDK) is returned as-is.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "nfc_normalize"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires string, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any =
      TextNorm.nfc(v.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val code =
        code"""
          ${c.code}
          boolean ${ev.isNull} = ${c.isNull};
          UTF8String ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.TextNorm.nfc(${c.value});
          }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static kernel shared by interpreted eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** nfc_normalize(text) over a string column. */
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))

  /** The full document-normalization pass: NFC composition → lowercase →
    * whitespace collapse → trim. Equivalent oracle formulation:
    * `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))`.
    */
  def normalizeDoc(text: Column): Column = {
    import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
    trim(regexp_replace(lower(nfcNormalize(text)), "\\s+", " "))
  }
}
