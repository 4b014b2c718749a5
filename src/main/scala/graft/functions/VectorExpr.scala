package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector kernels for embedding columns. Each reproduces, bit
  * for bit, the arithmetic of its composed-builtin twin (sequential
  * left-fold, per-element double casts) — so swapping them in changes
  * NOTHING semantically (same DuckDB oracle), only removes the
  * interpreted per-element lambda overhead from the hot path.
  */
object VectorExprUtil {

  private def elem(a: ArrayData, floats: Boolean, i: Int): Double =
    if (floats) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ (double)a[i] · (double)b[i], sequential — equals
    * aggregate(zip_with(a, b, x·y), 0.0, +). Iterates min length like
    * zip_with, treating the absent tail as contributing nothing (the
    * fold on zip_with's null products would poison the sum — inputs
    * here are fixed-width embeddings, so lengths always match).
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, aF, i) * elem(b, bF, i); i += 1 }
    acc
  }

  /** nPlanes-bit hyperplane signature — equals
    * VectorFunctions.lshSignature: plane component from the integer LCG
    * ((j·64+i+1)·1103515245+12345) mod 2^31, mapped to [-0.5, 0.5).
    */
  def lshSig(v: ArrayData, vF: Boolean, nPlanes: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val seed = (j * 64 + i + 1).toLong * 1103515245L + 12345L
        val r = (seed % 2147483648L).toDouble / 2147483648.0 - 0.5
        acc += elem(v, vF, i) * r
        i += 1
      }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

private object VectorExprTypes {
  def isFloatArr(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExprTypes._
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_d requires array<float|double>, got ${left.dataType}, ${right.dataType}")

  private def lF = isFloatArr(left.dataType)
  private def rF = isFloatArr(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprUtil.dot($a, $b, $lF, $rF)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class HyperplaneSig(child: Expression, nPlanes: Int) extends UnaryExpression {
  import VectorExprTypes._
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_sig requires array<float|double>, got ${child.dataType}")

  private def vF = isFloatArr(child.dataType)

  override protected def nullSafeEval(v: Any): Any =
    VectorExprUtil.lshSig(v.asInstanceOf[ArrayData], vF, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprUtil.lshSig($c, $vF, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object VectorExprFunctions {
  def dot_d(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def lsh_sig(v: Column, nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(v), nPlanes))
}
