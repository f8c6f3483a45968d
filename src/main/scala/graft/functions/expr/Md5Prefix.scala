package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first `nHex` hex digits of md5(s) as an unsigned long — the
  * engine's deterministic lottery primitive, bit-identical to the
  * portable SQL spelling `conv(substring(md5(s), 1, nHex), 16, 10)`
  * (DuckDB: `('0x' || substring(md5(s), 1, nHex))::BIGINT`) that every
  * md5-lottery operator gates against.
  *
  * Why a native expression (optimization guide §1.2 step 2 — per-task
  * work): the composed builtin form allocates a fresh MessageDigest AND
  * a 32-char hex string per row, then `conv` re-parses that string with
  * a byte-array radix converter — three allocations and two format
  * conversions to extract 60 bits the digest already holds. This
  * expression reuses a thread-local MessageDigest and reads the prefix
  * straight from the digest bytes; it is codegen'd as one static call so
  * the surrounding projection stays in whole-stage codegen.
  *
  * Equivalence: md5 hex is the big-endian hex rendering of the 16
  * digest bytes, so the first `nHex` hex digits are the top `4·nHex`
  * bits — `beLong(bytes[0..8)) >>> (64 − 4·nHex)`. `nHex <= 15` keeps
  * the value in [0, 2^60): non-negative in a signed long, exactly the
  * range the conv() spelling yields. Md5PrefixSpec pins parity against
  * the conv() form on randomized inputs. */
case class Md5PrefixLong(child: Expression, nHex: Int) extends UnaryExpression {

  require(nHex >= 1 && nHex <= 15, s"nHex must be in [1, 15], got $nHex")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.prefix(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.Md5Prefix.prefix($c, $nHex);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5Prefix {

  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Top 4·nHex bits of md5(s), as an unsigned long (static so codegen
    * can call it). */
  def prefix(s: UTF8String, nHex: Int): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * nHex)
  }

  def apply(c: Column, nHex: Int): Column =
    Bridge.column(Md5PrefixLong(Bridge.expression(c), nHex))
}
