package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression (SURVEY.md
  * §2.10 tier (b)). Spark has no built-in normalizer, yet canonical
  * equivalence is the FIRST normalization any multilingual dedup key
  * needs: "é" arrives both precomposed (U+00E9) and decomposed
  * (e + U+0301) across crawls, and byte-level hashing treats them as
  * different documents. NFC (not NFKC) is deliberate: canonical
  * composition is lossless and idempotent, while compatibility folding
  * (ﬁ→fi, ²→2) changes text content — that tier belongs to
  * [[graft.pipeline.TextAnalysis.canonicalize]]-style lossy keys.
  *
  * Engine parity: `java.text.Normalizer` (ICU-equivalent, JDK-public)
  * and DuckDB's utf8proc `nfc_normalize` both implement UAX#15 NFC, so
  * the oracle twin is exact. Cost: `Normalizer.isNormalized` runs first
  * — on the (dominant) already-NFC corpus slice the input is returned
  * AS-IS with zero allocation, so the scan-side cost is one quick-check
  * pass, not a per-row rebuild.
  */
object UnicodeExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  /** Static helper the generated code calls. Already-normalized input
    * (the common case — all-ASCII is trivially NFC) returns the SAME
    * UTF8String, no copy.
    */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column = toColumn(NfcNormalizeExpr(toExpr(c)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeExpressions.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeExpressions.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
