package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `swapcase` string kernel (reference ascii_swapcase / utf8_swapcase,
  * cpp/src/arrow/compute/kernels/scalar_string_ascii.cc, compute.rst
  * §961-1049) — Spark has no builtin. Codegen'd: the generated code calls
  * the static [[SwapCase.swap]], so the expression stays inside
  * whole-stage codegen instead of falling back to interpreted eval.
  * Gated in q14b against a DuckDB `translate` over the ASCII alphabet. */
case class SwapCaseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_swapcase"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(SwapCase.swap(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.expr.SwapCase.swap($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): SwapCaseExpr =
    copy(child = newChild)
}

object SwapCase {
  /** Flip the case of every cased character, iterating CODE POINTS so
    * supplementary-plane letters (Deseret, Adlam, …) swap too — per-char
    * iteration would leave their surrogate halves untouched. */
  def swap(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out.appendAll(Character.toChars(
        if (Character.isUpperCase(cp)) Character.toLowerCase(cp)
        else if (Character.isLowerCase(cp)) Character.toUpperCase(cp)
        else cp))
      i += Character.charCount(cp)
    }
    out.toString
  }

  def apply(c: Column): Column = Bridge.column(SwapCaseExpr(Bridge.expression(c)))
}
