package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression — the
  * edit-metric complement to `levenshtein` for record linkage: Jaro
  * rewards shared characters within a sliding match window (length
  * `max(|a|,|b|)/2 - 1`) and penalizes transpositions; Winkler boosts
  * scores above 0.7 by up to 4 shared PREFIX characters (names/IDs
  * diverge at the tail far more often than the head — Winkler 1990,
  * U.S. Census record-linkage work).
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` exactly (probed
  * on the classic Winkler fixtures: MARTHA/MARHTA = 0.961111,
  * DIXON/DICKSONX = 0.813333, boost only when jaro > 0.7, either input
  * empty → 0.0), which is what lets a query over this expression gate
  * hash-for-hash against the DuckDB oracle. Like
  * [[DamerauLevenshteinExpr]] — and like the oracle engine — the metric
  * runs over UTF-8 BYTES, not UTF-16 code units: match window,
  * transposition count and the Winkler prefix all see bytes (probed:
  * héllo/hello = 0.84, 日本/日本語 = 0.9333…), so non-ASCII input
  * gates too. The byte contract is also why `sim` takes the raw
  * `UTF8String` buffers — no decode, no copy.
  *
  * Spark has no builtin (SPARK-48498 class of gaps); a Scala UDF would
  * leave whole-stage codegen — this is a static-call BinaryExpression,
  * the [[CountMinEstimate]] pattern. O(|a|·window) per pair; linkage
  * callers bound pair counts by blocking first
  * ([[graft.queries.AnalyticsQueries]] linkagePairs).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.sim(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.JaroWinklerExpr.sim(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Winkler's constants: boost only above 0.7, ≤4 prefix chars, 0.1
    * scale — the published parameters, and DuckDB's. */
  private val BoostThreshold = 0.7
  private val MaxPrefix = 4
  private val PrefixScale = 0.1

  /** Jaro-Winkler similarity in [0, 1] over UTF-8 bytes; either input
    * empty → 0.0. Byte-level (not codepoint-level) is the oracle
    * engine's contract — window, transpositions and prefix all count
    * bytes. */
  def sim(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (!found && j < hi) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched bytes compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // t counts mismatched POSITIONS; the Jaro transposition count is
    // half of it, kept in floating point (the classic formulation)
    val jaro = (m / l1 + m / l2 + (m - t / 2.0) / m) / 3.0
    if (jaro <= BoostThreshold) return jaro
    var prefix = 0
    val maxP = math.min(MaxPrefix, math.min(l1, l2))
    while (prefix < maxP && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * PrefixScale * (1.0 - jaro)
  }

  /** String convenience (specs/fixtures): routes through the UTF-8
    * byte metric — identical to what the expression computes. */
  def sim(s1: String, s2: String): Double =
    sim(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
