package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * must grow (rare; requires a shuffle by definition). A hive-partitioned
  * table is compacted PER PARTITION LEAF — each `key=value` directory is
  * rewritten in place, so the partition layout (and partition pruning on
  * later reads) survives, and `targetBytes` sizes files within each
  * partition.
  *
  * Swap protocol, per rewritten directory: the rewrite lands in a HIDDEN
  * sibling (`.<name>.compact_tmp` — dot-prefixed paths are invisible to
  * Spark/Hadoop listings, so a crashed rewrite can never be mistaken for
  * a partition), then installs via rename(src → .old), rename(tmp → src),
  * delete(.old). A failed rename rolls the source back. CRASH WINDOW: if
  * the process dies between the two renames, the directory is absent and
  * its data sits intact in `.<name>.compact_old` — [[recover]] repairs
  * exactly that state (and cleans stray tmp/old dirs); nothing is ever
  * deleted before its replacement is installed. On object stores without
  * atomic directory rename, run compaction from a single maintenance
  * process and rely on [[recover]] — the window cannot be closed by
  * ordering alone.
  */
object Compact {

  /** Path segments that Spark/Hadoop listings ignore (and so do we). */
  private def isHidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  private def parquetFilesUnder(fs: FileSystem, dir: Path): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    def walk(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (isHidden(st.getPath.getName)) ()
        else if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) out += st.getPath
      }
    walk(dir)
    out.result()
  }

  /** Number of parquet data files currently under `dir` (recursive —
    * partition subdirectories count; hidden/temp paths do not). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    parquetFilesUnder(fs, p).size
  }

  /** Directories under `root` that directly contain parquet data files —
    * `root` itself for a flat table, the partition leaves for a
    * hive-partitioned one. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] =
    parquetFilesUnder(fs, root).map(_.getParent).distinct

  /** Rewrite the parquet table at `dir` into files of roughly
    * `targetBytes` (compressed) each, preserving any hive partition
    * layout. Returns the resulting data-file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val src = new Path(dir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = leafDirs(fs, src)
    require(leaves.nonEmpty,
      s"compact: no parquet data files under $dir (nothing to rewrite)")
    leaves.foreach(leaf => compactLeaf(spark, fs, leaf, targetBytes))
    dataFileCount(spark, dir)
  }

  /** Flat-directory rewrite + two-rename swap (see swap protocol above). */
  private def compactLeaf(
      spark: SparkSession, fs: FileSystem, src: Path, targetBytes: Long): Unit = {
    val totalBytes = fs.listStatus(src)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(src.toString)
    val current = df.rdd.getNumPartitions
    val sized =
      if (nFiles <= current) df.coalesce(nFiles) // narrow — no shuffle
      else df.repartition(nFiles)
    val tmp = new Path(src.getParent, s".${src.getName}.compact_tmp")
    sized.write.mode("overwrite").parquet(tmp.toString)

    val old = new Path(src.getParent, s".${src.getName}.compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(src, old))
      throw new java.io.IOException(s"compaction swap failed moving $src aside")
    if (!fs.rename(tmp, src)) {
      fs.rename(old, src) // roll back — source untouched
      throw new java.io.IOException(s"compaction swap failed installing $tmp")
    }
    fs.delete(old, true)
  }

  /** Repair after a compaction crash: for every `.<name>.compact_old`
    * under `dir` whose target is missing, rename the old data back into
    * place (the crash-between-renames state); delete olds whose target
    * was installed, and delete stray `.compact_tmp` dirs. Idempotent.
    * Returns the number of directories restored.
    *
    * SINGLE-MAINTENANCE-PROCESS REQUIRED (same contract as [[compact]]):
    * recover cannot distinguish a crashed rewrite from one that is
    * mid-flight in another process, so running it concurrently with an
    * active compaction of the same table would repair state that is not
    * broken. As a belt-and-braces guard it only deletes `.compact_tmp`
    * dirs older than `minTmpAgeMs` (default 1 h) — an in-flight rewrite's
    * tmp is younger than that, a crashed run's is not; `.compact_old`
    * handling is age-independent because restoring a missing target is
    * always the safe direction. */
  def recover(spark: SparkSession, dir: String,
              minTmpAgeMs: Long = 3600 * 1000L): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def tmpStale(p: Path): Boolean =
      System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > minTmpAgeMs
    var restored = 0
    // the flat-table swap happens at `dir` itself, so its old/tmp
    // siblings live in the PARENT — repair that level first
    val rootOld = new Path(root.getParent, s".${root.getName}.compact_old")
    val rootTmp = new Path(root.getParent, s".${root.getName}.compact_tmp")
    def restore(old: Path, target: Path): Unit = {
      if (!fs.rename(old, target))
        throw new java.io.IOException(
          s"recover failed restoring $old to $target — table data is still " +
            "in the .compact_old directory; repair manually before reading")
      restored += 1
    }
    if (!fs.exists(root) && fs.exists(rootOld)) restore(rootOld, root)
    else if (fs.exists(rootOld)) fs.delete(rootOld, true)
    if (fs.exists(rootTmp) && tmpStale(rootTmp)) fs.delete(rootTmp, true)
    def walk(p: Path): Unit = {
      if (!fs.exists(p)) return
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith(".") && name.endsWith(".compact_old")) {
          val target = new Path(p, name.stripPrefix(".").stripSuffix(".compact_old"))
          if (!fs.exists(target)) restore(st.getPath, target)
          else fs.delete(st.getPath, true)
        } else if (st.isDirectory && name.startsWith(".") && name.endsWith(".compact_tmp")) {
          // incomplete rewrite — never installed; age-guarded so a rewrite
          // that is mid-flight in another process is not destroyed
          if (tmpStale(st.getPath)) fs.delete(st.getPath, true)
        } else if (st.isDirectory && !isHidden(name)) {
          walk(st.getPath)
        }
      }
    }
    walk(root)
    restored
  }

  /** Copy a source parquet table into a deliberately fragmented layout —
    * the fixture for compaction tests and the gated query (simulates a
    * micro-batch sink's output). */
  def fragment(df: DataFrame, dir: String, nFiles: Int): Unit =
    df.repartition(nFiles).write.mode("overwrite").parquet(dir)
}
