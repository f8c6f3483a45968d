package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein edit distance as a native
  * codegen expression: insertions, deletions, substitutions AND adjacent
  * transpositions, where a transposed pair may be edited again later
  * (Lowrance & Wagner 1975) — unlike the cheaper optimal-string-alignment
  * restriction. The practical delta for record linkage: `teh`→`the` and
  * `MARTHA`→`MARHTA` cost 1 (Levenshtein says 2), and `CA`→`ABC` costs 2
  * (OSA says 3) — transposition typos are the single most common keyboard
  * error class, so an edit-distance dedup tier that prices them at 2
  * under-merges.
  *
  * Semantics match DuckDB's `damerau_levenshtein` exactly — probed
  * pairwise on 3 000 random strings with zero mismatches, which pinned
  * two contracts the gate depends on: the metric is the FULL DL (the
  * `d[k][l] + (i-k-1) + 1 + (j-l-1)` transposition recurrence over the
  * last-occurrence table, not the 3-cell OSA band), and it runs over
  * UTF-8 BYTES, not codepoints (`héllo`→`hello` = 2). The byte-level
  * contract is why `sim` takes the raw `UTF8String` buffers — no
  * decode, no copy beyond the DP rows.
  *
  * Spark has no builtin (only `levenshtein`); a Scala UDF would leave
  * whole-stage codegen — this is a static-call BinaryExpression, the
  * [[JaroWinklerExpr]] pattern. O(|a|·|b|) time, O(|a|·|b|) ints for the
  * matrix plus a 256-slot last-occurrence table per call; linkage callers
  * bound pair counts by blocking first
  * ([[graft.queries.AnalyticsQueries]] linkagePairs).
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinExpr.dist(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.DamerauLevenshteinExpr.dist(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshteinExpr {

  /** Lowrance–Wagner DP with the (n+2)×(m+2) sentinel border: row/col 0
    * hold the INF = n+m sentinel so the transposition lookup
    * `d(k-?, l-?)` never needs a bounds check. `da` maps each byte to
    * the last row it appeared in (1-based); `db` is the last column in
    * THIS row where the bytes matched. */
  def dist(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val bj = b(j - 1) & 0xff
        val k = da(bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(
      DamerauLevenshteinExpr(Bridge.expression(a), Bridge.expression(b)))
}
