package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative fixpoints (PageRank rounds, CC
  * label propagation, LPA, k-core peeling, HITS, SCC coloring, HyperBall).
  *
  * Default (no config): eager `localCheckpoint` — lineage truncates into
  * EXECUTOR-LOCAL cached blocks. Fast (no durable write), and exactly
  * right on the local[32] test rig, but NOT fault-tolerant: the blocks
  * live only on their executors, so on a real cluster one executor loss
  * mid-PageRank kills the whole query (truncated lineage cannot
  * recompute).
  *
  * Reliable mode — the 100 TB story: set `spark.graft.checkpoint.dir` to
  * a durable path (HDFS / object store) and EVERY round goes through
  * `Dataset.checkpoint(eager = true)` instead: each round frame is
  * written durably and the job survives executor loss at any point. The
  * frames these loops truncate are (node, score/label) pairs — ids and
  * scalars, never text or adjacency payloads — so the per-round write is
  * small by construction. Every round (not every K-th) is deliberate:
  * a sparser cadence would need the skipped rounds to persist WITH
  * lineage, which (a) pins un-collectable cache entries for the session
  * lifetime (CacheManager holds plans strongly, unlike localCheckpoint
  * RDDs, which the ContextCleaner reclaims) and (b) can hand the caller
  * a LAZY final frame whose inputs the loop already unpersisted — both
  * measured-for classes of bug, neither worth the write savings on
  * frames this small.
  *
  * Output values are policy-independent: both paths materialize the same
  * deterministic frame, only its storage changes (CheckpointSpec asserts
  * bit-identical PageRank/CC/SCC output under a checkpoint dir).
  */
object Checkpointer {
  /** Durable checkpoint directory; empty/unset = localCheckpoint mode. */
  val DirKey = "spark.graft.checkpoint.dir"

  // The dir last installed via setCheckpointDir. SparkContext stores a
  // QUALIFIED path with a fresh UUID subdirectory (file:/dir/<uuid>), so
  // neither equality nor prefix tests against the configured value can
  // detect "already set" — remember what we installed instead, or every
  // round would mint a new subdir (per-iteration fs.mkdirs latency and
  // unbounded directory sprawl on an object store).
  @volatile private var installedDir: String = null

  /** Truncate/materialize one round's frame under the session policy. */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.trim.nonEmpty) match {
      case Some(d) =>
        if (installedDir != d) synchronized {
          if (installedDir != d) {
            spark.sparkContext.setCheckpointDir(d)
            installedDir = d
          }
        }
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
  }

  /** Release the executor blocks behind a frame [[truncate]] produced in
    * LOCAL-checkpoint mode, for loops that supersede round i's frame once
    * round i+1 has materialized — without this, every round's blocks
    * linger until the driver GCs the Dataset reference (ContextCleaner),
    * and a bench/pipeline that runs many iterative queries back-to-back
    * accumulates gigabytes of dead round-state in the block manager,
    * evicting live caches. ONLY call on a frame no action will ever read
    * again: a localCheckpoint's lineage is truncated, so its data is
    * unrecoverable after this. Durable checkpoints (reliable mode) and
    * non-checkpoint frames are left untouched (no-op) — their cleanup
    * stays with the ContextCleaner. */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    // a localCheckpoint's RDD is persisted (MEMORY_AND_DISK blocks); a
    // reliable checkpoint's RDD reads from files and carries StorageLevel
    // NONE, so the guard skips it (and every non-checkpoint frame)
    case l: org.apache.spark.sql.execution.LogicalRDD
        if l.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
      l.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
