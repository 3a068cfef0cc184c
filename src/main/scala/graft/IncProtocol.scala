package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * The increment protocol's filesystem primitives, shared by the
 * micro-batch jobs ([[EmbeddingCurationJob]], [[TrainingSetJob]]'s
 * incremental form): content-keyed write-ahead verdicts + marker-gated
 * appends give at-least-once delivery an exactly-once curation EFFECT —
 * a redelivered increment replays its recorded verdicts and completed
 * appends are skipped, so nothing lands twice. The residual window both
 * jobs document: a crash BETWEEN an append finishing and its marker
 * creation still double-appends that one relation (transactional table
 * formats close it; parquet appends cannot).
 */
private[graft] object IncProtocol {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** A parquet dir counts as written only once its _SUCCESS commits —
    * bare existence would treat a crashed partial write as state. */
  def completed(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/_SUCCESS")

  /** Whether `incKey`'s append to `relDir` already landed (its marker
    * exists) — the lock condition for config-change guards: once an
    * increment has mutated a relation, its verdicts can no longer be
    * re-evaluated under different parameters. */
  def appliedTo(spark: SparkSession, relDir: String, incKey: String): Boolean =
    exists(spark, s"$relDir/_graft_inc_applied_$incKey")

  /** Run `write` into `relDir` exactly once per increment content: the
    * marker file gates the append, so a retried increment skips writes
    * that already landed instead of double-appending. */
  def appendOnce(spark: SparkSession, relDir: String, incKey: String)(
      write: => Unit): Unit = {
    val marker = new Path(s"$relDir/_graft_inc_applied_$incKey")
    val fs = FileSystem.get(marker.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) { write; fs.create(marker, false).close() }
  }
}
