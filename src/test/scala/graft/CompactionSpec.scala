package graft

import graft.pipeline.Compact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("compaction reduces file count without changing content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val src = Tables.documents(spark, sf)
    Compact.fragment(src, dir, nFiles = 64)
    assert(Compact.dataFileCount(spark, dir) == 64)

    val before = spark.read.parquet(dir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val n = Compact.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(n < 64 && n >= 1, s"expected a real reduction, got $n files")
    assert(Compact.dataFileCount(spark, dir) == n)
    // no temp/backup residue from the swap
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("compact_")),
      parent.listFiles().map(_.getName).mkString(", "))

    val after = spark.read.parquet(dir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(after == before)
    assert(spark.read.parquet(dir).select(sum(col("n_chars"))).head().getLong(0) ==
      src.select(sum(col("n_chars"))).head().getLong(0))
  }

  test("hive-partitioned layout survives compaction (per-leaf rewrite)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact3").toString + "/t"
    val src = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    // fragmented partitioned write: many small files per partition
    src.repartition(16).write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(dir)
    val beforeFiles = Compact.dataFileCount(spark, dir)
    assert(beforeFiles >= 3 * 8, s"fixture should be fragmented, got $beforeFiles")
    val beforeAgg = spark.read.parquet(dir)
      .groupBy("l_returnflag").agg(round(sum(col("l_quantity")), 4).as("q"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap

    val n = Compact.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(n < beforeFiles, s"expected reduction from $beforeFiles, got $n")
    // partition directories still present → pruning still works
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(parts.forall(_.startsWith("l_returnflag=")), parts.mkString(","))
    assert(parts.size >= 3)
    // partition column survives as a partition (not folded into data files)
    val leaf = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("l_returnflag="))
      .head.getPath
    assert(!spark.read.parquet(leaf).columns.contains("l_returnflag"))
    // content identical, readable through normal partition discovery
    val afterAgg = spark.read.parquet(dir)
      .groupBy("l_returnflag").agg(round(sum(col("l_quantity")), 4).as("q"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(afterAgg == beforeAgg)
  }

  test("recover repairs the crash-between-renames state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact4").toString + "/t"
    Compact.fragment(Tables.documents(spark, sf), dir, nFiles = 4)
    val rows = spark.read.parquet(dir).count()
    // simulate dying between rename(src, old) and rename(tmp, src)
    val p = java.nio.file.Paths.get(dir)
    val old = p.getParent.resolve(".t.compact_old")
    java.nio.file.Files.move(p, old)
    assert(!java.nio.file.Files.exists(p))
    assert(Compact.recover(spark, dir) == 1)
    assert(spark.read.parquet(dir).count() == rows)
    // idempotent: nothing left to repair
    assert(Compact.recover(spark, dir) == 0)
  }

  test("recover leaves a fresh (possibly in-flight) compact_tmp alone") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact5").toString
    val dir = base + "/t"
    Compact.fragment(Tables.documents(spark, sf), dir, nFiles = 2)
    val tmp = java.nio.file.Paths.get(base, ".t.compact_tmp")
    java.nio.file.Files.createDirectory(tmp)
    // default 1h age guard: a just-created tmp could be another process's
    // mid-flight rewrite, so recover must not destroy it
    assert(Compact.recover(spark, dir) == 0)
    assert(java.nio.file.Files.exists(tmp))
    // explicit zero age: crashed-run cleanup still works on demand
    assert(Compact.recover(spark, dir, minTmpAgeMs = -1L) == 0)
    assert(!java.nio.file.Files.exists(tmp))
  }

  test("file count tracks the byte target; tiny targets grow via repartition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    Compact.fragment(Tables.documents(spark, sf), dir, nFiles = 8)
    // a 2 KB target forces more output files than the 8 inputs
    val n = Compact.compact(spark, dir, targetBytes = 2L * 1024)
    assert(n > 8, s"tiny target should fragment further, got $n")
    val rows = spark.read.parquet(dir).count()
    assert(rows == Tables.documents(spark, sf).count())
    intercept[IllegalArgumentException] {
      Compact.compact(spark, dir, targetBytes = 0)
    }
  }
}
