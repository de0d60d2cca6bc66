package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Counting-only regex match: Spark's own `regexp_count` is
 * RuntimeReplaceable to `size(regexp_extract_all(...))`, which
 * materializes a UTF8String per match plus the array holding them —
 * pure allocation when the caller only wants the COUNT (token
 * counting over every document of a corpus). This expression runs the
 * matcher loop and counts, allocating nothing per match; the pattern
 * is compiled once per task (a foldable literal, like Spark's regexp
 * family requires in codegen).
 */
object RegexpKernels {
  def countMatches(s: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

case class RegexpCountFast(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.foldable, "regexp_count_fast: the pattern must be a literal")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"regexp_count_fast expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def nullIntolerant: Boolean = true

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, p: Any): Any =
    RegexpKernels.countMatches(s.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", pattern, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.text.RegexpKernels.countMatches($s, $patRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RegexpCount {
  /** Count of non-overlapping matches of a literal `pattern` in `text`
    * — exactly `size(regexp_extract_all(text, pattern, 0))`, minus the
    * per-match allocations. */
  def re_count(text: Column, pattern: String): Column =
    ColumnBridge.column(RegexpCountFast(
      ColumnBridge.expression(text.cast(StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(pattern), StringType)))
}
