package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling char-k-gram PolyHash: for a string of n code points, the
  * n − k + 1 hashes of every k-code-point window — the primitive under
  * corpus-level REPEATED-SUBSTRING detection (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better"), where
  * the unit of deduplication is a long repeated span, not a whole
  * document.
  *
  * Each output is the COMBINED double hash
  * `poly_hash(w) · Mod2 + poly_hash2(w)` of the window w — the oracle
  * hashes the substrings directly with both folds. A single 30-bit
  * hash space measurably false-merges at corpus scale (8 colliding
  * buckets over the ~86k windows of the sf0.01 documents table alone,
  * inflating the repeated-doc set 67 → 82); the ~60-bit pair drops
  * the per-pair odds to ~1e-18, and still fits one long
  * (< 1e9+7 · 998244353 < 2^63). Both folds roll:
  * `h ← ((h − cp_out·M^(k−1)) · M + cp_in) mod p` preserves the
  * direct-fold value at every step because the fold is linear in the
  * code points mod p. Rolling makes the pass O(n) instead of the
  * composed transform's O(n·k) — at 100 TB this expression IS the
  * map stage, so the factor of k matters.
  */
object CharGramHashUtil {
  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val chars = str.length
    // decode code points once (surrogate-pair aware, same iteration
    // PolyHashUtil.hash uses)
    var n = 0
    var j = 0
    while (j < chars) { n += 1; j += Character.charCount(str.codePointAt(j)) }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var i = 0
    j = 0
    while (j < chars) {
      val cp = str.codePointAt(j)
      cps(i) = cp
      i += 1
      j += Character.charCount(cp)
    }
    val m1 = PolyHashUtil.Mult
    val p1 = PolyHashUtil.Mod
    val m2 = PolyHashUtil.Mult2
    val p2 = PolyHashUtil.Mod2
    var mk1 = 1L // M1^(k-1) mod p1
    var mk2 = 1L // M2^(k-1) mod p2
    var e = 0
    while (e < k - 1) { mk1 = mk1 * m1 % p1; mk2 = mk2 * m2 % p2; e += 1 }
    val out = new Array[Long](n - k + 1)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < k) {
      h1 = (h1 * m1 + cps(i)) % p1
      h2 = (h2 * m2 + cps(i)) % p2
      i += 1
    }
    out(0) = h1 * p2 + h2
    i = k
    while (i < n) {
      val cpOut = cps(i - k)
      val cpIn = cps(i)
      h1 = (h1 - cpOut * mk1 % p1 + p1) % p1 // drop the outgoing cp
      h1 = (h1 * m1 + cpIn) % p1 // take in the incoming cp
      h2 = (h2 - cpOut * mk2 % p2 + p2) % p2
      h2 = (h2 * m2 + cpIn) % p2
      out(i - k + 1) = h1 * p2 + h2
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharGramHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_gram_hash needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hash requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharGramHashUtil.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharGramHashUtil.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHash =
    copy(child = newChild)
}

object CharGramHashFunctions {
  /** Column API: char_gram_hash(text, k) → array<long> of the rolling
    * k-code-point-window PolyHashes.
    */
  def char_gram_hash(c: Column, k: Int): Column =
    ColumnBridge.column(CharGramHash(ColumnBridge.expression(c), k))
}
