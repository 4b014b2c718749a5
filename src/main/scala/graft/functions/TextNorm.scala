package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel. The oracle twin is DuckDB's
  * `nfc_normalize()` — both implement Unicode Normalization Form C
  * (canonical decomposition + canonical composition), so "é" composed
  * as U+00E9 and decomposed as U+0065 U+0301 canonicalize to the same
  * bytes on both engines.
  */
object TextNormUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // the quick check answers without allocating for already-normal
    // text (all ASCII, most real corpora) — the common hot path
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native NFC normalization expression (Spark has no builtin Unicode
  * normalizer): stays inside whole-stage codegen like every other
  * function on the documents hot path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_norm requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextNormUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNormFunctions {

  /** Column API: Unicode NFC canonicalization. */
  def nfc_norm(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Full pre-dedup text canonicalization: NFC, then lowercase, then
    * collapse every whitespace run to one space, then trim. Exact SQL
    * twin (same operation order):
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`.
    * Both engines' `\s` is the ASCII class and both `lower`s are
    * Unicode simple case folding, so the composition is bit-stable.
    */
  def norm_text(c: Column): Column =
    trim(regexp_replace(lower(nfc_norm(c)), "\\s+", " "))
}
