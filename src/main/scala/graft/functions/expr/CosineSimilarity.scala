package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns, with whole-stage codegen.
  *
  * This is the hot inner loop of embedding dedup / ANN (millions of pairs ×
  * vector width). The composable formulation
  * (`aggregate(zip_with(...))`, see VectorOps.cosineHof) allocates an
  * intermediate array and runs interpreted lambdas per element; this
  * expression generates a single fused loop — same accumulation order, so
  * results are bit-identical to the HOF version, just faster. Preference
  * ladder per SURVEY.md §2.3: builtin < custom Expression < UDF.
  *
  * Null elements inside the arrays are read as 0 (embeddings are dense);
  * a null input yields SQL NULL via BinaryExpression's null-intolerant
  * default, and a length-mismatched pair yields SQL NULL via an explicit
  * equal-length guard (a truncated embedding must not silently score as a
  * near-duplicate of its prefix).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<float> by construction (VectorOps call sites);
  // ExpectsInputTypes is sql-private in Spark 4 so typing is by contract

  override def dataType: DataType = DoubleType

  // a length-mismatched pair yields NULL even when both inputs are
  // non-nullable columns
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getFloat($i);
         |    double $yi = $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
