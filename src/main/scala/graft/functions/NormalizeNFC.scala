package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the corpus
  * canonicalization step byte-level operators need in front of them: a
  * decomposed "é" (e + U+0301) and the composed form are DIFFERENT byte
  * strings, so exact dedup, fingerprinting, shingle hashing and equality
  * joins silently treat identical text as distinct until both sides are
  * normalized to one canonical form. Spark ships no normalizer function;
  * this wraps `java.text.Normalizer` (Form.NFC).
  *
  * Oracle parity: DuckDB's `nfc_normalize` implements the same Unicode
  * normalization form, so normalized output hash-matches cross-engine.
  * The per-row String round-trip (UTF8String → String → UTF8String) is
  * inherent to the JDK API; the expression stays inside whole-stage
  * codegen so the cost is the allocation, not an interpreter hop.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_nfc expects a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {
  /** Column form: NFC-normalize a string column. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(NormalizeNFC(GraftColumnBridge.expression(c)))
}
