package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingling — the hot inner loop of the
  * whole dedup/decontamination family.
  *
  * The composable formulation (TextOps.shinglesHof) evaluates
  * `split → sequence → transform(concat_ws(slice(...))) → array_distinct`
  * per row: one token array, one index array, and one freshly
  * concatenated string PER SHINGLE. This expression exploits that the
  * delimiter is a single space, so re-joining n consecutive tokens with
  * single spaces reproduces the ORIGINAL byte range between the two token
  * boundaries — consecutive/leading/trailing spaces included (empty
  * tokens occupy zero bytes between delimiters). One scan finds the
  * boundaries and every shingle is a zero-copy slice of the input's
  * bytes; a LinkedHashSet dedups in first-occurrence order, exactly like
  * `array_distinct`. Bit-parity with the HOF twin is asserted in TextSpec
  * (corpus + adversarial whitespace + randomized).
  *
  * Null contract matches the twin: the HOF's `when(...).otherwise(array())`
  * turns a NULL text into an EMPTY shingle set, so this expression is
  * non-nullable and does the same.
  */
case class ShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs a string column, got $other")
  }

  private def emptyResult = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return emptyResult // twin: null text → empty set
    val bytes = v.asInstanceOf[UTF8String].getBytes
    // split(text, " ") keeps leading/trailing/consecutive empties:
    // one token per inter-delimiter gap
    var numToks = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20.toByte) numToks += 1
      i += 1
    }
    val count = numToks - (n - 1)
    if (count < 1) return emptyResult
    // starts(k) = byte offset of token k; sentinel start(numToks) is one
    // past a virtual delimiter at end-of-input, so every shingle's end is
    // uniformly starts(i + n) - 1
    val starts = new Array[Int](numToks + 1)
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20.toByte) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(numToks) = bytes.length + 1
    val seen = new java.util.LinkedHashSet[UTF8String](count * 4 / 3 + 1)
    i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(i + n) - 1
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  def apply(text: Column, n: Int): Column =
    Bridge.column(new ShinglesExpr(Bridge.expression(text), n))
}
