package graft.lsh

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Hamming distance between packed-long code columns. */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingExpr.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.lsh.HammingExpr.kernel($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HammingExpr {
  def kernel(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    s
  }

  /** Hamming distance of two ARRAY<BIGINT> packed-code columns. */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
