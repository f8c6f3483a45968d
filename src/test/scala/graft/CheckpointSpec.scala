package graft

import graft.pipeline.{Checkpointer, Dedup, GraphOps}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint lever ([[graft.pipeline.Checkpointer]]): with
  * `spark.graft.checkpoint.dir` set, the iterative loops write EVERY
  * round frame durably instead of into executor-local blocks — the
  * fault-tolerance mode a real cluster run needs. Output must be
  * BIT-IDENTICAL under both policies: only storage changes, never
  * values.
  */
class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges: DataFrame = {
    import spark.implicits._
    // two components: a 4-cycle with a chord + a directed pair, plus a
    // chain that exercises multi-round label propagation
    Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L))
      .toDF("src", "dst")
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

  /** Run `f` with the reliable-checkpoint config set, restoring the
    * default (unset) policy afterwards even on failure. */
  private def withCheckpointDir[A](f: => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpointer.DirKey, dir)
    try f finally spark.conf.unset(Checkpointer.DirKey)
  }

  test("pagerank output is bit-identical under a reliable checkpoint dir") {
    val base = collectSorted(GraphOps.pageRank(edges, "src", "dst", 5))
    val durable = withCheckpointDir {
      collectSorted(GraphOps.pageRank(edges, "src", "dst", 5))
    }
    assert(durable == base)
  }

  test("connected components are bit-identical under a reliable checkpoint dir") {
    val base = collectSorted(Dedup.connectedComponents(edges, "src", "dst"))
    assert(base.nonEmpty)
    val durable = withCheckpointDir {
      collectSorted(Dedup.connectedComponents(edges, "src", "dst"))
    }
    assert(durable == base)
    val stars = withCheckpointDir {
      collectSorted(Dedup.connectedComponentsStars(edges, "src", "dst"))
    }
    assert(stars == base, "stars variant shares the output contract")
  }

  test("scc matches; durable frames land; the checkpoint dir installs ONCE") {
    val base = collectSorted(GraphOps.stronglyConnected(edges, "src", "dst"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-scc").toString
    spark.conf.set(Checkpointer.DirKey, dir)
    try {
      val durable = collectSorted(
        GraphOps.stronglyConnected(edges, "src", "dst"))
      assert(durable == base)
      val root = java.nio.file.Paths.get(dir)
      // the mode is real: round frames were written under the dir
      def countFiles(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      assert(countFiles(root) > 0,
        s"no checkpoint files under $dir — reliable mode did not engage")
      // setCheckpointDir mints one UUID subdirectory per call; the
      // installed-dir memo must prevent a fresh subdir per ROUND (the
      // qualified-path trap: getCheckpointDir returns file:/..., so
      // neither equality nor prefix tests against the conf value work)
      val subdirs = {
        val s = java.nio.file.Files.list(root)
        try s.count() finally s.close()
      }
      assert(subdirs == 1L,
        s"expected ONE uuid subdir (installed once), found $subdirs")
    } finally spark.conf.unset(Checkpointer.DirKey)
  }
}
