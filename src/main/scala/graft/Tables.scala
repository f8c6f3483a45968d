package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test-data star schema (TESTDATA.md).
  *
  * Each loader is a plain parquet scan, so Catalyst predicate pushdown,
  * column pruning and partition pruning all apply downstream — the Spark
  * analogue of the reference's dataset-scan pushdown
  * (reference: cpp/src/arrow/dataset/scanner.h:59-78).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = raw(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = raw(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = raw(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = raw(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = raw(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = raw(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = raw(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = raw(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = raw(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * We read it as a raw nanosecond long and truncate to microseconds
    * (integer division — `ts` is far above 2^53 so double math would lose
    * precision). DuckDB applies the same ns→µs truncation when casting
    * TIMESTAMP_NS to TIMESTAMP, so both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events with a pushdown-friendly event-time filter: the predicate is
    * applied to the *raw nanosecond long* before the µs conversion, so it
    * reaches the parquet scan as a long-range filter (row-group pruning
    * works). At 100 TB this is the difference between scanning a day and
    * scanning the full history. */
  def eventsBetween(
      s: SparkSession,
      d: String,
      fromMicros: Long,
      untilMicros: Long): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(s, d, "events")
      .filter(col("ts") >= fromMicros * 1000L && col("ts") < untilMicros * 1000L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Stable scratch-directory key for a scale-factor dir: the path plus
    * the lineitem file's (mtime, size), so regenerating the dataset at
    * the same path invalidates any cached fixture layout derived from it.
    * Shared by every query that persists a reusable /tmp fixture. */
  def scratchKey(d: String): String = {
    val f = new java.io.File(s"$d/lineitem.parquet")
    val sig = s"$d|${f.lastModified}|${f.length}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
  }

  def load(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case n        => raw(s, d, n)
  }

  /** Build-once immutable fixture directory: if `dir` lacks a `_SUCCESS`
    * marker, run `write` against a process-unique temp sibling and
    * atomically rename it into place; once present the directory is never
    * rewritten, so readers can never observe a half-deleted state (the
    * delete-then-write race of `mode("overwrite")` on a shared path).
    * Rename losers delete their temp copy and use the winner's. Stale
    * temp siblings from crashed runs (>1 h old) are swept before
    * building, so repeated crashes cannot accumulate copies. */
  def immutableFixture(dir: String)(write: String => Unit): Unit = {
    val target = new java.io.File(dir)
    if (new java.io.File(target, "_SUCCESS").exists()) return
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    val parent = target.getParentFile
    Option(parent.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith(s"${target.getName}.tmp_") &&
        f.lastModified < System.currentTimeMillis() - 3600 * 1000L) rm(f)
    })
    val tmp = new java.io.File(
      parent,
      s"${target.getName}.tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    write(tmp.getPath)
    if (!tmp.renameTo(target)) {
      // renameTo fails both when another writer won the race AND when
      // tmp/target straddle filesystems (cross-device /tmp mount) — only
      // the first case leaves a winner to reuse. For the second, fall back
      // to Hadoop's rename, whose local implementation degrades to a copy
      // across devices instead of silently returning false.
      if (new java.io.File(target, "_SUCCESS").exists()) {
        rm(tmp) // another writer installed the fixture first — use theirs
      } else {
        val conf = new org.apache.hadoop.conf.Configuration()
        val fs = new org.apache.hadoop.fs.Path(target.getPath).getFileSystem(conf)
        val moved = fs.rename(
          new org.apache.hadoop.fs.Path(tmp.getPath),
          new org.apache.hadoop.fs.Path(target.getPath))
        if (!moved) rm(tmp)
        require(new java.io.File(target, "_SUCCESS").exists(),
          s"fixture install failed at $dir: File.renameTo and Hadoop " +
            s"rename from ${tmp.getPath} both failed and no concurrent " +
            "writer installed the fixture")
      }
    }
  }
}
