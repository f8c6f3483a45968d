package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Union-type encoding (reference SPARSE_UNION/DENSE_UNION,
  * cpp/src/arrow/type.h:1446, type ids 27/28). Spark has no union type;
  * SURVEY.md §1.2 maps unions to a struct of a type tag plus one nullable
  * field per branch — exactly one branch is non-null per row, selected by
  * the tag (the relational reading of Arrow's child-array + type-ids
  * layout). These helpers build and consume that encoding as ordinary
  * Columns, so unions compose with every other operator and survive
  * parquet round-trips as plain structs.
  */
object UnionOps {

  /** Build a tagged union value: `branches(i)` is stored when
    * `tag === i`, every other branch is null (sparse-union shape with
    * the tag deciding validity). */
  def makeUnion(tag: Column, branches: (String, Column)*): Column = {
    struct(
      (tag.cast("int").as("tag") +:
        branches.zipWithIndex.map { case ((name, c), i) =>
          when(tag === i, c).as(name)
        }): _*)
  }

  /** Extract one branch: the branch value where the tag matches, null
    * elsewhere (reference union child access). */
  def unionExtract(u: Column, branchIndex: Int, branchName: String): Column =
    when(u.getField("tag") === branchIndex, u.getField(branchName))

  /** Tag of a union value. */
  def unionTag(u: Column): Column = u.getField("tag")

  /** Case analysis over the branches: `cases(i)` maps branch i's value to
    * a common result type (the reference's visit-by-type-id). */
  def unionMatch(u: Column, cases: (String, Column => Column)*): Column =
    cases.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, ((name, f), i)) =>
        when(u.getField("tag") === i, f(u.getField(name))).otherwise(acc)
    }
}
