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
