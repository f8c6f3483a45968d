package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `utf8_normalize` string kernel (reference
  * cpp/src/arrow/compute/kernels/scalar_string_utf8.cc `UTF8NormalizeExec`,
  * compute.rst utf8_normalize with NFC/NFKC/NFD/NFKD options) — Spark has
  * no builtin Unicode normalization. Codegen'd: the generated code calls
  * `java.text.Normalizer` with a per-expression constant form, so it stays
  * inside whole-stage codegen. The NFC path is oracle-gated against
  * DuckDB's `nfc_normalize`; the other forms are test-asserted against
  * `java.text.Normalizer` properties (idempotence, NFD∘NFC = NFD).
  *
  * Skips the normalizer for pure-ASCII inputs: every normalization form is
  * the identity on ASCII, and `Normalizer.isNormalized` costs a scan
  * anyway — the fast path avoids the String copy for the overwhelmingly
  * common case in web corpora.
  */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  // fail fast on a bad form name at construction (analysis time), not per row
  private val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeExpr.normalize(input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.expr.NormalizeExpr.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.${normForm.name}));")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {

  def normalize(s: String, form: Normalizer.Form): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s else Normalizer.normalize(s, form)
  }

  def apply(c: Column, form: String): Column =
    Bridge.column(NormalizeExpr(Bridge.expression(c), form))
}
