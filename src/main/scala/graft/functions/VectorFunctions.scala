package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, built from
  * codegen-friendly higher-order functions — no UDFs, no driver-side
  * math.
  *
  * Determinism contract (shared with the DuckDB oracle): every float
  * element is cast to double BEFORE multiplication, and sums are
  * explicit sequential left-folds — both engines then produce
  * bit-identical IEEE-754 doubles, so even threshold compares and
  * rank orderings agree exactly.
  */
object VectorFunctions {

  /** Sequential left-fold sum of a double array. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) with per-element double casts — native codegen kernel
    * (DotProduct); bit-identical to the fold form below.
    */
  def dot(a: Column, b: Column): Column = VectorExprFunctions.dot_d(a, b)

  /** Composed-builtin twin of `dot`, kept for cross-checking the native
    * kernel in tests (identical sequential-fold arithmetic).
    */
  def dotFold(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = VectorExprFunctions.dot_d(a, a)

  /** Cosine similarity dot/(|a|·|b|). Callers should pre-compute norms
    * when one side repeats (see Similarity.knnBrute).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine from a precomputed dot and squared norms. */
  def cosineFrom(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))

  // ---- random-hyperplane LSH ----

  /** Deterministic pseudo-random hyperplane component r(j, i) — the
    * multiply-mod-prime / xor-shift mixer (see
    * VectorExprUtil.planeComponent, the single source of truth),
    * reproducible in ANSI SQL (integer ops, xor, shift, one double
    * division). j = plane index, i = dimension index.
    */
  def planeComponent(j: Int, i: Column): Column = {
    import VectorExprUtil.{PlaneM31, PlaneMul1, PlaneMul2, PlaneMul3}
    val h1 = ((lit(j) * 64 + i + 1).cast("long") * PlaneMul1) % PlaneM31
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = (h2 * PlaneMul2) % PlaneM31
    val h4 = h3.bitwiseXOR(shiftright(h3, 13))
    val h5 = (h4 * PlaneMul3) % PlaneM31
    h5.cast("double") / lit(PlaneM31.toDouble) - lit(0.5)
  }

  /** Sign bit of the projection of `vec` onto pseudo-plane j. */
  def planeBit(vec: Column, j: Int): Column = {
    val proj = foldSum(
      transform(vec, (x, i) => x.cast("double") * planeComponent(j, i)))
    when(proj > 0, lit(1L << j)).otherwise(lit(0L))
  }

  /** nPlanes-bit LSH signature: bucket key for approximate cosine
    * neighbor search — native codegen kernel (HyperplaneSig).
    */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    VectorExprFunctions.lsh_sig(vec, nPlanes)

  /** Composed-builtin twin of `lshSignature`, kept for cross-checking
    * the native kernel in tests.
    */
  def lshSignatureFold(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(j => planeBit(vec, j)).reduce(_ + _)
}
