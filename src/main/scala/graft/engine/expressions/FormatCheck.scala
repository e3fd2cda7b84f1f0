package graft.engine.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static, generated-code-callable bridge into the row core's format
  * checkers ([[graft.validate.Formats.check]]) — the SAME code both paths
  * run, so column/row parity holds by construction for every format,
  * including the ones that can't be a single regex (date-time/date/time via
  * java.time parsing, idn-hostname via java.net.IDN, regex-compilability). */
object FormatCheckBridge {
  def check(format: UTF8String, s: UTF8String): Boolean =
    graft.validate.Formats.check(format.toString, s.toString)
}

/** Native Catalyst expression for draft-7 `format` over a string column.
  * Codegen emits a static call (no CodegenFallback, no UDF boxing), keeping
  * the validation projection inside whole-stage codegen. The format name is
  * baked in at plan-build time. */
case class FormatCheck(child: Expression, format: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_format_check"

  override protected def nullSafeEval(s: Any): Any =
    FormatCheckBridge.check(UTF8String.fromString(format), s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmtRef = ctx.addReferenceObj("graftFormatName", UTF8String.fromString(format))
    defineCodeGen(ctx, ev, c =>
      s"graft.engine.expressions.FormatCheckBridge.check($fmtRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): FormatCheck =
    copy(child = newChild)
}

object FormatCheckFunctions {
  /** Column-level entry (usable without any registration). */
  def formatCheck(col: Column, format: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FormatCheck(org.apache.spark.sql.GraftColumnBridge.expression(col), format))
}
