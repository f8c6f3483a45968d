package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-table maintenance: versioned upsert (SCD-1 merge) and snapshot
  * diff — the bookkeeping half of a living 100 TB corpus next to
  * [[Compact]]'s physical half. Both are single id-keyed shuffles; text
  * rides the shuffle only where the result needs it (the winning row /
  * the changed row), never twice.
  */
object Maintenance {

  /** Latest-version-wins upsert: `base` rows are version 0, `updates`
    * carry explicit versions (ties broken toward the UPDATE, then the
    * higher version — deterministic for any input). One row per id
    * survives. The classic MERGE INTO semantics expressed as one
    * window over the union — a single hash exchange on the id, no join,
    * which at 100 TB beats the join-based merge whenever updates are a
    * nontrivial fraction of the base. */
  def upsert(base: DataFrame, updates: DataFrame,
      idCol: String, versionCol: String): DataFrame = {
    val cols = base.columns
    require(cols.sameElements(updates.columns),
      s"base and updates must share a schema: ${cols.mkString(",")} vs " +
        updates.columns.mkString(","))
    require(cols.contains(versionCol), s"missing version column $versionCol")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** SCD-2 history-preserving merge: instead of [[upsert]]'s one
    * surviving row per id, EVERY version becomes a history row with a
    * validity interval — `valid_from` = its own version, `valid_to` =
    * the next version of the same id (NULL while current), plus an
    * `is_current` flag. This is the warehouse "type 2 slowly changing
    * dimension" build, and the point-in-time lookup it enables ("the
    * payload as of version t") is `valid_from <= t AND (t < valid_to OR
    * valid_to IS NULL)` — a banded range join downstream
    * ([[graft.operators.RangeJoin]] / the as-of family).
    *
    * Collisions on (id, version) resolve by [[upsert]]'s exact tie rule
    * (update beats base) BEFORE intervals form, so history is a
    * function, not a multimap. Scale shape: ONE id-keyed hash exchange
    * serving both the collision window and the `lead` interval window
    * (same partitioning, Spark reuses the sort); text rides the shuffle
    * once. */
  def scd2(base: DataFrame, updates: DataFrame,
      idCol: String, versionCol: String): DataFrame = {
    val cols = base.columns
    require(cols.sameElements(updates.columns),
      s"base and updates must share a schema: ${cols.mkString(",")} vs " +
        updates.columns.mkString(","))
    require(cols.contains(versionCol), s"missing version column $versionCol")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val dedup = Window.partitionBy(col(idCol), col(versionCol))
      .orderBy(col("__src").desc)
    val history = Window.partitionBy(col(idCol)).orderBy(col(versionCol))
    tagged
      .withColumn("__rn", row_number().over(dedup))
      .filter(col("__rn") === 1)
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(history))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__src", "__rn")
  }

  /** Snapshot diff: one row per id present in either snapshot, with
    * `change` ∈ added | removed | changed | unchanged (content compared
    * on `contentCol`). A full outer join keyed on the id — both sides
    * shuffle once; at 100 TB co-partitioned/bucketed snapshots make it
    * exchange-free (q25e's layout). */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val b = before.select(col(idCol), col(contentCol).as("__b"))
    val a = after.select(col(idCol), col(contentCol).as("__a"))
    b.join(a, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__b").isNull, "added")
          .when(col("__a").isNull, "removed")
          .when(col("__a") === col("__b"), "unchanged")
          .otherwise("changed").as("change"),
        col("__a").as("content"))
  }
}
