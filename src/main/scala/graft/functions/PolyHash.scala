package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash over a string's Unicode code
  * points: `h = (h * 131 + codepoint) mod 1e9+7`, h0 = 0.
  *
  * This is the engine's shared fingerprint primitive — document
  * fingerprinting, MinHash shingle hashing and SimHash token hashing all
  * build on it. It is a native Catalyst `Expression` WITH `doGenCode`, so
  * it stays inside whole-stage codegen (a Scala UDF here would break the
  * codegen span on the hot path of every dedup query).
  *
  * The exact arithmetic is chosen to be reproducible in ANSI-ish SQL
  * (DuckDB oracle: `list_reduce(list_prepend(0, list_transform(
  * split(s,''), c -> unicode(c))), (a,x) -> (a*131+x) % 1000000007)`),
  * which is what makes the dedup family hash-checkable end-to-end.
  */
object PolyHashUtil {
  val Mod: Long = 1000000007L
  val Mult: Long = 131L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHashFunctions {
  /** Column API: poly_hash(str) → long in [0, 1e9+7). */
  def poly_hash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
