package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability (SURVEY.md §2.5): a named deterministic
  * query over the test tables, with (when SQL-expressible) an equivalent
  * DuckDB oracle query for the driver's differential-correctness gate.
  *
  * Every query output is fully ordered by a deterministic key, and every
  * computed column is identically aliased in the Spark code and the oracle
  * SQL (the driver's compare sorts columns by name before hashing).
  */
final case class Capability(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false)

object Registry {

  lazy val all: Seq[Capability] =
    queries.RelationalQueries.caps ++
      queries.FunctionQueries.caps ++
      queries.WindowQueries.caps ++
      queries.NestedIOQueries.caps ++
      queries.IngestQueries.caps ++
      queries.ExtendedQueries.caps ++
      queries.AnalyticsQueries.caps ++
      queries.TimeSeriesQueries.caps ++
      queries.SketchQueries.caps ++
      queries.StatsQueries.caps ++
      queries.BasketQueries.caps ++
      pipeline.DedupQueries.caps ++
      pipeline.SimilarityQueries.caps ++
      pipeline.TextQueries.caps ++
      pipeline.ClassifyQueries.caps ++
      pipeline.ShardingQueries.caps ++
      pipeline.MultimodalQueries.caps

  lazy val byName: Map[String, Capability] = all.map(c => c.name -> c).toMap
}
