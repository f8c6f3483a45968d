package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * ingest needs: streaming sinks and fine-grained partitioned writes leave
  * thousands of KB-sized files whose per-file open/footer/task overhead
  * eventually dominates scans.
  *
  * Strategy: size the target file count from the directory's actual bytes
  * (Hadoop FS listing — object-store safe), then rewrite with `coalesce`
  * when shrinking (a NARROW repartitioning: no shuffle, each output task
  * concatenates input splits) and `repartition` only when the directory
  * must grow (rare; requires a shuffle by definition). The rewrite lands
  * in a sibling temp directory and swaps in with two renames, so a
  * failed compaction never destroys the source.
  */
object Compact {

  /** Number of parquet data files currently in `dir`. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
  }

  /** Rewrite the parquet directory at `dir` into files of roughly
    * `targetBytes` (compressed) each. Returns the resulting file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val src = new Path(dir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(src)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val current = df.rdd.getNumPartitions
    val sized =
      if (nFiles <= current) df.coalesce(nFiles) // narrow — no shuffle
      else df.repartition(nFiles)
    val tmp = new Path(src.getParent, src.getName + ".compact_tmp")
    sized.write.mode("overwrite").parquet(tmp.toString)

    val old = new Path(src.getParent, src.getName + ".compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(src, old))
      throw new java.io.IOException(s"compaction swap failed moving $src aside")
    if (!fs.rename(tmp, src)) {
      fs.rename(old, src) // roll back — source untouched
      throw new java.io.IOException(s"compaction swap failed installing $tmp")
    }
    fs.delete(old, true)
    dataFileCount(spark, dir)
  }

  /** Copy a source parquet table into a deliberately fragmented layout —
    * the fixture for compaction tests and the gated query (simulates a
    * micro-batch sink's output). */
  def fragment(df: DataFrame, dir: String, nFiles: Int): Unit =
    df.repartition(nFiles).write.mode("overwrite").parquet(dir)
}
