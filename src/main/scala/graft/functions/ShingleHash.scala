package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native word-n-gram shingle hasher: from a token array, produce the
  * PolyHash of every n-consecutive-token shingle "tok_i tok_i+1 …"
  * (single-space joined) — WITHOUT materializing the shingle strings.
  *
  * Semantically identical to
  * `transform(word_shingles(toks, n), s -> poly_hash(s))`, but that
  * composition runs on the interpreted higher-order-function path
  * (~µs per lambda element) and copies an array slice per position;
  * this expression is one codegen'd call into a tight loop — measured
  * ~20× faster on the sf0.1 documents table. The dedup family
  * (n-gram Jaccard, MinHash) sits on top of it, so it IS the hot path.
  */
object ShingleHashUtil {
  /** Rolling the space separator into the fold keeps the result equal
    * to PolyHash("t1 t2 t3") exactly — the oracle SQL hashes the joined
    * string.
    */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * PolyHashUtil.Mult + ' '.toInt) % PolyHashUtil.Mod
        val s = toks.getUTF8String(i + k).toString
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * PolyHashUtil.Mult + cp) % PolyHashUtil.Mod
          j += Character.charCount(cp)
        }
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** Native k-way MinHash: min over the input hashes of (h·a_i + b_i)
  * mod p, for each of the k fixed (a_i, b_i) pairs. One pass over the
  * array for all k functions; returns null for an empty array (no
  * shingles → no signature), matching the `size(hs) > 0` oracle filter.
  */
object MinHashUtil {
  def signature(hs: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got $other")
  }

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.signature(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashUtil.signature($c, $aRef, $bRef, ${p}L);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native SimHash over a token array: for each of the low `bits` bits
  * of each token's combined hash, accumulate +1/−1 by bit value over
  * the token MULTISET; output bit b is set when its sum is positive.
  * Order-independent (a sum), so it equals the explode → groupBy →
  * per-bit-conditional-sums formulation exactly — without the shuffle
  * that formulation needs. Null for an empty token array (no signal),
  * which the group-by form expresses by producing no row.
  *
  * The per-token hash is 60 bits wide: two INDEPENDENT 30-bit PolyHash
  * spaces packed as `h1 | h2 << 30` — each reproducible in exact
  * integer SQL (the oracle computes the same two folds), which a
  * single 64-bit multiply-mod hash would not be. Bits 0..29 equal the
  * primary PolyHash bits, so `bits ≤ 30` callers see the pre-widening
  * behavior unchanged.
  */
object SimHashUtil {
  def simhash(toks: ArrayData, bits: Int): Any = {
    val n = toks.numElements()
    if (n == 0) return null
    val acc = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val h = PolyHashUtil.hash(s) |
        (PolyHashUtil.hash(s, PolyHashUtil.Mult2, PolyHashUtil.Mod2) << 30)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }
}

case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two SimHash expressions in one whole-stage-codegen
      // context must not declare the same local (janino would fail and
      // silently fall back to interpreted execution)
      val res = ctx.freshName("simhashRes")
      s"""
         |Object $res = graft.functions.SimHashUtil.simhash($c, $bits);
         |${ev.isNull} = ($res == null);
         |${ev.value} = ${ev.isNull} ? -1L : ((java.lang.Long) $res).longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** |A ∩ B| of two SORTED-ASCENDING distinct long arrays by a single
  * merge pass — the verification kernel of the near-dup family.
  * `size(array_intersect(a, b))` is semantically identical on distinct
  * inputs but builds a hash set + result array PER PAIR; candidate
  * verification runs once per candidate pair (dedup's hottest loop
  * after candidate generation), so the zero-allocation merge matters.
  * Callers sort each doc's array ONCE (`sort_array` per doc, not per
  * pair) — the expression itself assumes, and does not check, order.
  */
object SortedIntersectUtil {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size requires two array<long> arguments, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectUtil.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ShingleHashFunctions {
  /** shingle_hash(tokens, n): array of PolyHashes of word n-grams. */
  def shingle_hash(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(toks), n))

  /** sorted_intersect_size(a, b): |A ∩ B| of sorted distinct arrays. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** minhash_sig(hs, a, b, p): k-way MinHash signature (null if empty). */
  def minhash_sig(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), a, b, p))

  /** simhash(tokens, bits): SimHash of the token multiset (null if empty). */
  def simhash(toks: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(toks), bits))
}
