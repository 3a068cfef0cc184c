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
  def apply(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
}
