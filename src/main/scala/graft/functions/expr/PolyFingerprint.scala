package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native Catalyst expression: polynomial rolling fingerprint
  * `fold (acc*31 + char) mod 1e9+7` over a string's UTF-16 chars.
  *
  * Semantics match TextOps.polyFingerprintHof (the
  * `aggregate(sequence(...))` formulation) for BMP text — `ascii(substr)`
  * per char equals `charAt` there — but runs as one generated loop instead
  * of an interpreted per-character lambda with a materialized index array
  * (~8 s → sub-second over the sf0.1 corpus). Case-folding is applied by
  * the caller (see [[TextOps.polyFingerprint]]).
  */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression {

  // input is a string by construction (TextOps call site); ExpectsInputTypes
  // is sql-private in Spark 4 so typing is by contract
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31 + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  def apply(c: Column): Column =
    Bridge.column(PolyFingerprint(Bridge.expression(c)))
}
