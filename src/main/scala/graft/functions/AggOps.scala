package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-aggregate option surface re-expressed as
  * column combinators (reference `ScalarAggregateOptions(skip_nulls,
  * min_count)`, cpp/src/arrow/compute/api_aggregate.h:36-44, and
  * `VarianceOptions(ddof)`, api_aggregate.h:84).
  *
  * Spark's builtins fix skip_nulls=true / min_count=0, and expose ddof
  * only as the pop/samp function pairs; these helpers close the gap so a
  * reference user can port `sum(x, min_count=3)` or
  * `variance(x, ddof=0)` verbatim. They compose with any aggregate and
  * stay whole-stage-codegen'd conditionals over ordinary aggregates — no
  * UDAF, no extra shuffle.
  */
object AggOps {

  /** `min_count` semantics: the aggregate is null unless at least
    * `minCount` non-null inputs contributed (api_aggregate.h:41-43).
    * `agg` must aggregate over `values` for the guard to be meaningful. */
  def withMinCount(agg: Column, values: Column, minCount: Int): Column =
    when(count(values) >= minCount, agg)

  /** `skip_nulls=false` semantics: one null input nulls the whole
    * aggregate (api_aggregate.h:36-40; SQL aggregates default to
    * skip_nulls=true). */
  def noSkipNulls(agg: Column, values: Column): Column =
    when(count(when(values.isNull, lit(1))) === 0, agg)

  /** `VarianceOptions(ddof)` (api_aggregate.h:84): divisor n - ddof.
    * ddof=0 is the population variance, ddof=1 the sample variance; any
    * other ddof is derived by rescaling the population numerator. */
  def varianceDdof(values: Column, ddof: Int): Column = ddof match {
    case 0 => var_pop(values)
    case 1 => var_samp(values)
    case d =>
      val n = count(values)
      when(n > d, var_pop(values) * n / (n - d))
  }

  /** stddev with an explicit ddof — sqrt of [[varianceDdof]]. */
  def stddevDdof(values: Column, ddof: Int): Column =
    sqrt(varianceDdof(values, ddof))
}
