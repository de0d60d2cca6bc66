package graft.lsh

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Codegen'd Catalyst expression: `ARRAY<FLOAT>` vector ->
 * `ARRAY<STRUCT<t INT, d INT, key BIGINT, code ARRAY<BIGINT>>>`,
 * one element per (table, division) of the fitted [[LshModel]].
 *
 * The model rides along as a codegen reference object, so the per-row
 * work (tables*divisions dense m x dim projections + bit packing) runs
 * inside whole-stage codegen with zero boxing per element.
 */
case class LshCodesExpr(child: Expression, model: LshModel) extends UnaryExpression {
  override def dataType: DataType = LshCodesExpr.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    LshCodesExpr.codeAll(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lshModel", model, classOf[LshModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.lsh.LshCodesExpr.codeAll($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshCodesExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("code", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  /** Static kernel shared by interpreted eval and generated code. */
  def codeAll(v: ArrayData, model: LshModel): ArrayData = {
    val p = model.params
    val vec = new Array[Float](v.numElements())
    var i = 0
    while (i < vec.length) { vec(i) = v.getFloat(i); i += 1 }
    val out = new Array[Any](p.tables * p.divisions)
    var idx = 0
    var t = 0
    while (t < p.tables) {
      var d = 0
      while (d < p.divisions) {
        val words = model.g(t, d).codeWords(vec, p.codeWords)
        out(idx) = new GenericInternalRow(Array[Any](
          t, d, Lsh.key(words), new GenericArrayData(words)))
        idx += 1
        d += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}
