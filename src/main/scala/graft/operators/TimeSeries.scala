package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series operators Spark lacks natively.
 *
 * The as-of join is THE canonical one: annotate each left row with the
 * most recent right row at-or-before its timestamp (per key) — prices at
 * trade time, feature snapshots at event time, config state at log time.
 */
object TimeSeries {

  /**
   * Distributed as-of join: for every `left` row, the latest `right` row
   * with `right.ts <= left.ts` on the same key supplies `valueCols`
   * (suffixed; null when no right row precedes).
   *
   * Shape: Spark would plan the naive inequality join as a broadcast
   * nested loop (or an exploded range join) — quadratic per key. Instead
   * both sides UNION (right rows carry the values, left rows nulls) and a
   * per-key window takes the last non-null value over (ts, side) order:
   * ONE shuffle on the key, each row touched once, per-task state = one
   * value per column. Equal timestamps resolve INCLUSIVELY (the right row
   * sorts before left rows at the same ts), matching DuckDB's
   * `ASOF JOIN ... ON l.ts >= r.ts`, which hash-verifies this operator.
   *
   * Determinism: callers must make `right` unique per (key, ts) — e.g.
   * aggregate first — otherwise "the" latest row at a timestamp is
   * arbitrary (every engine shares this caveat; DuckDB picks one too).
   * Skew note: the window partitions by key; a pathologically hot key
   * serializes through one task — pre-filter or split such keys upstream.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keyCols and valueCols required")
    val rPrepped = right.select(
      (keyCols :+ tsCol).map(col) ++ valueCols.map(c => col(c).as(c + suffix)): _*)
      .withColumn("__src", lit(0))
    val unioned = left.withColumn("__src", lit(1))
      .unionByName(rPrepped, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v + suffix, last(col(v + suffix), ignoreNulls = true).over(w))
    }.filter(col("__src") === 1).drop("__src")
  }

  /**
   * Keyed interval (range) join: every (left, right) pair on the same key
   * with `left.ts ∈ [right.start, right.end]` (inclusive both ends).
   *
   * Spark plans a raw `BETWEEN` join condition as an equi-join on the key
   * with the range as a post-join filter — fine — but with NO key (or a
   * hot key) it degrades to a nested loop over every (event, interval)
   * pair. The scalable shape buckets time into `bucketSeconds` cells:
   * each left row lands in exactly ONE bucket, each right interval
   * EXPLODES into the buckets it covers (sized so that's a handful), and
   * the join becomes a plain equi-join on (key, bucket) + exact range
   * filter. Each qualifying pair emerges exactly once — the left row has
   * one bucket, and the interval covers it once — so no dedup pass.
   * Choose `bucketSeconds` ≈ the typical interval length: shorter wastes
   * join fan-out, longer packs too many rows per cell.
   *
   * The oracle (`events_range`) states the plain inequality join in
   * DuckDB — hash parity proves the bucketing is lossless.
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // UTC-session epoch seconds; internal only (any monotonic mapping
    // works — the oracle never sees the buckets)
    def sec(c: org.apache.spark.sql.Column) =
      unix_seconds(c.cast("timestamp"))
    val lB = left.withColumn("__bucket", floor(sec(col(tsCol)) / bucketSeconds))
    val rB = right.withColumn("__bucket",
      explode(sequence(floor(sec(col(startCol)) / bucketSeconds),
        floor(sec(col(endCol)) / bucketSeconds))))
    lB.join(rB, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
