package graft

import graft.functions.expr.{CosineSimilarity, PolyFingerprint}
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
  }
}

object GraftFunctions {
  /** Idempotently register the graft_* SQL functions and the as-of-join
    * planner strategy on a live session (covers driver-created sessions
    * that didn't go through `withExtensions`). */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_fingerprint",
      exprs => PolyFingerprint(exprs.head))
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}
