package graft

import graft.functions.expr.{CosineSimilarity, DamerauLevenshteinExpr, DistinctSketchAgg, DistinctSketchEstimate, JaroWinklerExpr, MinHashSketch, PolyFingerprint, SimHashAgg, SketchUnionAgg, TDigestAgg, TopKAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** Session extension installing the graft SQL surface
  * (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`): the native expressions
  * become callable from SQL text, the analogue of the reference's
  * FunctionRegistry additions (cpp/src/arrow/compute/registry.h).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[PolyFingerprint].getName, "graft_fingerprint"),
      (exprs: Seq[Expression]) => PolyFingerprint(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName,
        "graft_damerau_levenshtein"),
      (exprs: Seq[Expression]) => DamerauLevenshteinExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_tdigest"),
      new ExpressionInfo(classOf[TDigestAgg].getName, "graft_tdigest"),
      GraftFunctions.tdigestBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "graft_minhash"),
      GraftFunctions.minhashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      GraftFunctions.simhashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
      GraftFunctions.topKBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_distinct_sketch"),
      new ExpressionInfo(classOf[DistinctSketchAgg].getName, "graft_distinct_sketch"),
      GraftFunctions.distinctSketchBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_sketch_union"),
      new ExpressionInfo(classOf[SketchUnionAgg].getName, "graft_sketch_union"),
      GraftFunctions.sketchUnionBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_sketch_estimate"),
      new ExpressionInfo(classOf[DistinctSketchEstimate].getName, "graft_sketch_estimate"),
      GraftFunctions.sketchEstimateBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_sketch_singleton"),
      new ExpressionInfo(
        classOf[graft.functions.expr.DistinctSketchSingleton].getName,
        "graft_sketch_singleton"),
      GraftFunctions.sketchSingletonBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(
        classOf[graft.functions.expr.CountMinAgg].getName, "graft_count_min"),
      GraftFunctions.countMinBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_count_min_union"),
      new ExpressionInfo(
        classOf[graft.functions.expr.CountMinUnionAgg].getName,
        "graft_count_min_union"),
      GraftFunctions.countMinUnionBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_count_min_estimate"),
      new ExpressionInfo(
        classOf[graft.functions.expr.CountMinEstimate].getName,
        "graft_count_min_estimate"),
      GraftFunctions.countMinEstimateBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_gram_matrix"),
      new ExpressionInfo(
        classOf[graft.functions.expr.GramMatrixAgg].getName, "graft_gram_matrix"),
      GraftFunctions.gramMatrixBuilder))
  }
}

object GraftFunctions {
  /** Idempotently register the graft_* SQL functions and the as-of-join
    * planner strategy on a live session (covers driver-created sessions
    * that didn't go through `withExtensions`). */
  /** `graft_tdigest(x, p1, p2, ...)` — quantile percentages must be
    * foldable literals (same contract as percentile_approx). */
  val tdigestBuilder: Seq[Expression] => Expression = exprs => {
    val ps = exprs.tail.map { e =>
      require(e.foldable, "graft_tdigest percentages must be literals")
      e.eval() match {
        case d: Double => d
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => other.toString.toDouble
      }
    }
    TDigestAgg(exprs.head, ps).toAggregateExpression()
  }

  /** `graft_minhash(hash_col, n)` — n must be a foldable literal. */
  val minhashBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_minhash takes (hash_col, n_hashes literal)")
    val n = exprs(1).eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"graft_minhash n_hashes must be an integral literal, got $other" +
          (if (other == null) "" else s" (${other.getClass.getSimpleName})"))
    }
    require(n >= 1, s"graft_minhash n_hashes must be >= 1, got $n")
    MinHashSketch(exprs.head, n).toAggregateExpression()
  }

  /** `graft_simhash(hash_col)` — exactly one argument. */
  val simhashBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1, "graft_simhash takes exactly one hash column")
    SimHashAgg(exprs.head).toAggregateExpression()
  }

  /** `graft_top_k(score, id, k)` — k must be a foldable literal. */
  val topKBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3 && exprs(2).foldable,
      "graft_top_k takes (score, id, k literal)")
    val k = exprs(2).eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_top_k k must be an integral literal, got $other")
    }
    TopKAgg(exprs(0), exprs(1), k).toAggregateExpression()
  }

  /** `graft_distinct_sketch(col [, exactCap, lgK])` — caps must be
    * foldable integral literals. */
  val distinctSketchBuilder: Seq[Expression] => Expression = exprs => {
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"graft_distinct_sketch $what must be a literal")
      e.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_distinct_sketch $what must be an integral literal, got $other")
      }
    }
    exprs match {
      case Seq(c) => DistinctSketchAgg(c).toAggregateExpression()
      case Seq(c, cap, lg) =>
        DistinctSketchAgg(c, intLit(cap, "exactCap"), intLit(lg, "lgK"))
          .toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_distinct_sketch takes (col) or (col, exactCap, lgK)")
    }
  }

  /** `graft_sketch_union(state_col [, exactCap, lgK])` — union of
    * serialized sketch states. */
  val sketchUnionBuilder: Seq[Expression] => Expression = exprs => {
    exprs match {
      case Seq(c) => SketchUnionAgg(c).toAggregateExpression()
      case Seq(c, cap, lg) =>
        SketchUnionAgg(c, intLitOf(cap, "graft_sketch_union exactCap"),
          intLitOf(lg, "graft_sketch_union lgK")).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_sketch_union takes (state) or (state, exactCap, lgK)")
    }
  }

  /** `graft_sketch_estimate(state_col [, exactCap, lgK])`. */
  val sketchEstimateBuilder: Seq[Expression] => Expression = exprs => {
    exprs match {
      case Seq(c) => DistinctSketchEstimate(c)
      case Seq(c, cap, lg) =>
        DistinctSketchEstimate(c, intLitOf(cap, "graft_sketch_estimate exactCap"),
          intLitOf(lg, "graft_sketch_estimate lgK"))
      case _ => throw new IllegalArgumentException(
        "graft_sketch_estimate takes (state) or (state, exactCap, lgK)")
    }
  }

  /** `graft_sketch_singleton(hash64 [, exactCap, lgK])` — one-element
    * serialized state, the SQL seed for `graft_sketch_union`. */
  val sketchSingletonBuilder: Seq[Expression] => Expression = exprs => {
    import graft.functions.expr.DistinctSketchSingleton
    exprs match {
      case Seq(c) => DistinctSketchSingleton(c)
      case Seq(c, cap, lg) =>
        DistinctSketchSingleton(c, intLitOf(cap, "graft_sketch_singleton exactCap"),
          intLitOf(lg, "graft_sketch_singleton lgK"))
      case _ => throw new IllegalArgumentException(
        "graft_sketch_singleton takes (hash) or (hash, exactCap, lgK)")
    }
  }

  /** `graft_count_min(col [, exactCap, depth, width])` — mergeable
    * Count-Min frequency state. */
  val countMinBuilder: Seq[Expression] => Expression = exprs => {
    import graft.functions.expr.CountMinAgg
    exprs match {
      case Seq(c) => CountMinAgg(c).toAggregateExpression()
      case Seq(c, cap, d, w) =>
        CountMinAgg(c, intLitOf(cap, "graft_count_min exactCap"),
          intLitOf(d, "graft_count_min depth"),
          intLitOf(w, "graft_count_min width")).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_count_min takes (col) or (col, exactCap, depth, width)")
    }
  }

  /** `graft_count_min_union(state [, exactCap, depth, width])`. */
  val countMinUnionBuilder: Seq[Expression] => Expression = exprs => {
    import graft.functions.expr.CountMinUnionAgg
    exprs match {
      case Seq(c) => CountMinUnionAgg(c).toAggregateExpression()
      case Seq(c, cap, d, w) =>
        CountMinUnionAgg(c, intLitOf(cap, "graft_count_min_union exactCap"),
          intLitOf(d, "graft_count_min_union depth"),
          intLitOf(w, "graft_count_min_union width")).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_count_min_union takes (state) or (state, exactCap, depth, width)")
    }
  }

  /** `graft_count_min_estimate(state, xxhash64(key) [, exactCap, depth,
    * width])`. */
  val countMinEstimateBuilder: Seq[Expression] => Expression = exprs => {
    import graft.functions.expr.CountMinEstimate
    exprs match {
      case Seq(s, h) => CountMinEstimate(s, h)
      case Seq(s, h, cap, d, w) =>
        CountMinEstimate(s, h, intLitOf(cap, "graft_count_min_estimate exactCap"),
          intLitOf(d, "graft_count_min_estimate depth"),
          intLitOf(w, "graft_count_min_estimate width"))
      case _ => throw new IllegalArgumentException(
        "graft_count_min_estimate takes (state, hash) or (state, hash, exactCap, depth, width)")
    }
  }

  /** `graft_gram_matrix(vec, dim)` — exact integer Gram/moment state. */
  val gramMatrixBuilder: Seq[Expression] => Expression = exprs => {
    import graft.functions.expr.GramMatrixAgg
    require(exprs.length == 2,
      "graft_gram_matrix takes (vec, dim literal)")
    GramMatrixAgg(exprs.head, intLitOf(exprs(1), "graft_gram_matrix dim"))
      .toAggregateExpression()
  }

  private def intLitOf(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integral literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_fingerprint",
      exprs => PolyFingerprint(exprs.head))
    Bridge.registerFunction(spark, "graft_jaro_winkler",
      exprs => JaroWinklerExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_damerau_levenshtein",
      exprs => DamerauLevenshteinExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_tdigest", tdigestBuilder)
    Bridge.registerFunction(spark, "graft_minhash", minhashBuilder)
    Bridge.registerFunction(spark, "graft_simhash", GraftFunctions.simhashBuilder)
    Bridge.registerFunction(spark, "graft_top_k", topKBuilder)
    Bridge.registerFunction(spark, "graft_distinct_sketch", distinctSketchBuilder)
    Bridge.registerFunction(spark, "graft_sketch_union", sketchUnionBuilder)
    Bridge.registerFunction(spark, "graft_sketch_estimate", sketchEstimateBuilder)
    Bridge.registerFunction(spark, "graft_sketch_singleton", sketchSingletonBuilder)
    Bridge.registerFunction(spark, "graft_count_min", countMinBuilder)
    Bridge.registerFunction(spark, "graft_count_min_union", countMinUnionBuilder)
    Bridge.registerFunction(spark, "graft_count_min_estimate", countMinEstimateBuilder)
    Bridge.registerFunction(spark, "graft_gram_matrix", gramMatrixBuilder)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}
