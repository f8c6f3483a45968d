package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: fold a vector column against a LITERAL
  * matrix — one output element per matrix row, each the sequential
  * in-array-order fold the engine-determinism contract requires
  * (bit-identical to the `aggregate(zip_with(...))` HOF formulation it
  * replaces, which DuckDB mirrors as `list_sum(list_transform(...))`).
  *
  * Two fold kernels, selected at construction:
  *  - `squaredDiff = true` → out_j = Σ_i (x_i − m_j,i)² — the k-means /
  *    IVF assignment distance ([[graft.pipeline.ClusterOps]]);
  *  - `squaredDiff = false` → out_j = Σ_i x_i·m_j,i — the trained-matrix
  *    projection ([[graft.pipeline.Project]]: PCA loadings, JL signs).
  * `round6 = true` applies Spark's exact `round(_, 6)` double semantics
  * (HALF_UP over `BigDecimal.valueOf`) to each element before emit, so
  * the rounded distances stay bit-identical to the oracle's.
  *
  * Why an expression and not the HOF composition: the HOF tree is
  * `CodegenFallback` (interpreted per row, one intermediate array per
  * matrix row) and — decisive for the iterative k-means loop — each new
  * centroid matrix used to rebuild k distinct literal-folded subtrees,
  * re-deriving generated projection code per Lloyd iteration per bench
  * rep. Here the matrix rides in `references` via `addReferenceObj`, so
  * the generated source is IDENTICAL for every matrix of every shape:
  * janino compiles the fused loop once per JVM and the per-row cost is a
  * tight k×dim primitive loop inside whole-stage codegen. (This was the
  * round-12 verdict's ann_kmeans 7× bench-swing suspect — the same
  * compile-cost pathology as the 64 KB JSD overflow.)
  *
  * Null semantics mirror the HOF composition exactly: null input → NULL
  * (null-intolerant default); length mismatch against the matrix rows →
  * NULL (zip_with would null-pad and poison every element); a null
  * VECTOR element → NULL (it nulls every matrix-row fold at once).
  * Reference for the assignment semantics this feeds:
  * arrow `cpp/src/arrow/compute/kernels/vector_selection.cc` has no
  * k-means — this is the beyond-reference LLM-pipeline tier (SURVEY §6).
  */
case class MatVecFold(child: Expression, matrix: Array[Array[Double]],
    squaredDiff: Boolean, round6: Boolean)
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.length == matrix(0).length),
    "MatVecFold: matrix must be non-empty and rectangular")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // non-null input can still yield NULL on length mismatch / null element
  override def nullable: Boolean = true

  override def prettyName: String = "graft_matvec_fold"

  // lazy: child.dataType resolves only after analysis
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"MatVecFold expects array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dim = matrix(0).length
    val n = x.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      var s = 0.0
      var i2 = 0
      while (i2 < n) {
        val xi = if (elemIsFloat) x.getFloat(i2).toDouble else x.getDouble(i2)
        s += (if (squaredDiff) { val d = xi - c(i2); d * d } else xi * c(i2))
        i2 += 1
      }
      out(j) = if (round6) MatVecFold.roundHalfUp6(s) else s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val mv = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val kernel =
        if (squaredDiff) s"double $d = $xi - $c[$i]; $s += $d * $d;"
        else s"$s += $xi * $c[$i];"
      val emit =
        if (round6) s"graft.functions.expr.MatVecFold.roundHalfUp6($s)" else s"$s"
      s"""
         |double[][] $mv = $m;
         |int $n = $a.numElements();
         |boolean $bad = ($n != $mv[0].length);
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  $bad = $a.isNullAt($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$mv.length];
         |  for (int $j = 0; $j < $mv.length; $j++) {
         |    double[] $c = $mv[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $xi = $a.$getter($i);
         |      $kernel
         |    }
         |    $out[$j] = $emit;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatVecFold =
    copy(child = newChild)
}

object MatVecFold {
  /** Spark's exact `round(double, 6)` semantics (Round's DoubleType
    * branch): HALF_UP over the shortest-decimal BigDecimal; NaN and
    * infinities pass through. Public because generated code calls it. */
  def roundHalfUp6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column entry: per-matrix-row rounded squared-L2 distances. */
  def distances2(vec: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(MatVecFold(Bridge.expression(vec), centroids,
      squaredDiff = true, round6 = true))

  /** Column entry: per-matrix-row raw sequential dot products. */
  def dots(vec: Column, rows: Array[Array[Double]]): Column =
    Bridge.column(MatVecFold(Bridge.expression(vec), rows,
      squaredDiff = false, round6 = false))
}
