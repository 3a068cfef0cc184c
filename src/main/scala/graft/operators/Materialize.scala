package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Lineage-truncating materialization for frames that are read many times
 * (iterative connected-components rounds) or whose lineage must not reach
 * back into a path about to be overwritten (the keyed-store merges).
 *
 * Default (`checkpointDir = None`): `localCheckpoint(eager = true)` —
 * executor-local block storage, no filesystem round-trip; right for
 * single-JVM and interactive runs. On a multi-executor cluster an executor
 * loss DESTROYS localCheckpoint blocks (they are not replicated and the
 * truncated lineage cannot recompute them), killing a long job late.
 * Passing `checkpointDir` switches to a RELIABLE `checkpoint()` through
 * `SparkContext.setCheckpointDir`: blocks persist to the (typically
 * fault-tolerant) filesystem and survive executor loss, at the cost of one
 * write+read per materialization — the right trade for multi-hour jobs.
 */
private[graft] object Materialize {
  /** Guards the global setCheckpointDir + checkpoint() pair: the dir is a
    * single mutable on the SparkContext, so an interleaved
    * (setA, setB, checkpointA) from two jobs sharing one session would
    * land A's blocks in B's directory — and B's cleanup would then delete
    * blocks whose truncated lineage cannot recompute. Serializing the
    * pair pins every checkpoint to its caller's dir; a SEQUENTIAL dir
    * change stays allowed (each ReliableCheckpointRDD remembers the path
    * it was written under). */
  private val reliableLock = new Object
  def apply(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        reliableLock.synchronized {
          // skip the re-set when this dir is already current (Spark
          // appends a UUID subdir on set, so compare by prefix)
          if (!sc.getCheckpointDir.exists(cur =>
              cur == dir || cur.startsWith(dir + "/")))
            sc.setCheckpointDir(dir)
          df.checkpoint()
        }
      case None => df.localCheckpoint(true)
    }

  /** Best-effort release of a frame previously returned by [[apply]]:
    * unpersists the localCheckpoint blocks backing its `LogicalRDD`
    * leaves so iterative callers (the topK widening loop, CC rounds)
    * don't accumulate pinned copies for the job's lifetime. Reliable
    * checkpoints are left alone — their files belong to the caller's
    * checkpoint dir lifecycle, and deleting them under a frame that
    * may still be read would be destructive. Safe to call only once
    * every consumer of `df` has finished reading it. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
