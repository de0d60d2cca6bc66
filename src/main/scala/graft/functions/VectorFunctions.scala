package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native codegen'd vector math over `ARRAY<FLOAT>` columns.
 *
 * The reference refines ANN candidates with exact L2 over decrypted
 * vectors (fspann `query/service/QueryServiceImpl.java:262`, `l2`).
 * Here the distance kernels are Catalyst expressions with `doGenCode`
 * so they stay inside whole-stage codegen (no UDF serialization, no
 * boxing) — the hot path of both brute-force ground truth and LSH
 * refinement at 100 TB.
 *
 * All kernels accumulate in double precision regardless of the float
 * storage type, matching a DuckDB oracle that computes over
 * `DOUBLE[]` casts.
 */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Name of the static kernel in [[VectorKernels]] invoked by both eval and codegen. */
  protected def kernel: String

  override def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def evalKernel(x: ArrayData, y: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernel($a, $b);")
}

/** Static kernels shared by interpreted eval and generated code. */
object VectorKernels {
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  def l2(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def kernel: String = "dot"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = VectorKernels.dot(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def kernel: String = "l2"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = VectorKernels.l2(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def kernel: String = "cosine"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = VectorKernels.cosine(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression =
    ColumnBridge.expression(c.cast(ArrayType(FloatType)))

  /** Dot product of two vector columns (cast to ARRAY<FLOAT>), double accumulation. */
  def vec_dot(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** Euclidean (L2) distance of two vector columns (cast to ARRAY<FLOAT>). */
  def vec_l2(a: Column, b: Column): Column = col(L2Distance(expr(a), expr(b)))

  /** Cosine similarity of two vector columns (cast to ARRAY<FLOAT>). */
  def vec_cosine(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))
}
