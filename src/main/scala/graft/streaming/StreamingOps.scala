package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming / incremental operators (SURVEY §2.8). The reference is a daily
 * batch with incremental traits (yesterday-slice templating, idempotent
 * upsert for late data); the Spark-native upgrades:
 *
 *  - file-source streaming reads (`Trigger.AvailableNow` = the scheduled
 *    daily batch, exactly-once via checkpoint);
 *  - watermarked event-time windows for the aggregation surface;
 *  - `dropDuplicatesWithinWatermark` as the streaming form of the keyed
 *    dedup-upsert (late duplicates within the lateness bound collapse);
 *  - gap-based sessionization, defined ONCE as batch SQL semantics
 *    (lag + cumulative sum — oracle-verifiable) with the streaming
 *    equivalent via `session_window`.
 */
object StreamingOps {

  /** Watermarked tumbling-window counts — streaming form of the engine's
    * `events_window` batch query (same result on bounded input). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      // watermarks require TIMESTAMP (LTZ); identity under the UTC session
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"), col("total"))

  /** Streaming keyed dedup: the upsert's no-op elimination under a
    * lateness bound (batch MERGE needs no watermark; streams do). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  /**
   * Gap-based sessionization, batch form: a session breaks after `gapMin`
   * minutes of inactivity per user. lag → boundary flag → running sum =
   * session index; then one agg per session. Two shuffles total (both on
   * user_id — the window and the groupBy share partitioning).
   */
  def sessionizeBatch(events: DataFrame, gapMin: Int = 30): DataFrame = {
    // event_id tiebreak keeps lag() deterministic under same-ts events
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // FULL-precision gap: unix_timestamp truncates to whole seconds, which
    // merges a 1800.5s gap under gapMin=30 where session_window splits it;
    // cast-to-double keeps the microseconds. Strict `>` matches
    // session_window exactly — a gap of precisely gapMin merges there
    // (probe-verified: its interval join is end-inclusive).
    def secs(c: Column) = c.cast("timestamp").cast("double")
    val newSession = when(
      secs(col("ts")) - secs(lag(col("ts"), 1).over(byUser)) > gapMin * 60.0,
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("__new", newSession)
      .withColumn("session_idx",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Streaming sessionization: built-in session_window (same gap
    * semantics, state-store backed). */
  def sessionizeStream(events: DataFrame, gapMin: Int = 30,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMin minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("total_value"))

  /** File-source stream over a directory of parquet (schema required by
    * Structured Streaming); pair with `Trigger.AvailableNow` for the
    * reference's daily-batch cadence. */
  def readEventStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** A keyed value on the stream: `k` = the compound key rendered to one
    * string (concat of key fields), `value` = the payload. */
  final case class KeyedValue(k: String, value: Double)
  final case class ClassifiedValue(k: String, value: Double, action: String)

  /**
   * Streaming upsert-classification — the reference's per-document dedup
   * probe (`ingestion_handler.py:182-202`) as a custom stateful operator:
   * state per compound key = last stored payload; each arriving record is
   * labeled create (no state) / unchanged (equal payload) / replace
   * (differing payload, when `replace`), and the state advances.
   *
   * This is the `flatMapGroupsWithState` form of `KeyedStore.classify` —
   * the batch join becomes a state-store lookup, giving effectively-once
   * upsert semantics over an unbounded stream (SURVEY §2.8). State is one
   * double per live key; bound it with key TTL in production
   * (GroupStateTimeout) when keys churn.
   */
  def classifyStream(increments: org.apache.spark.sql.Dataset[KeyedValue],
      replace: Boolean = true): org.apache.spark.sql.Dataset[ClassifiedValue] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import increments.sparkSession.implicits._
    increments
      .groupByKey(_.k)
      .flatMapGroupsWithState[Double, ClassifiedValue](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[Double]) =>
          // materialize: state updates must complete before returning
          val out = scala.collection.mutable.ListBuffer.empty[ClassifiedValue]
          var cur: Option[Double] = state.getOption
          rows.foreach { r =>
            val action = cur match {
              case None => "create"
              case Some(v) if v == r.value => "unchanged"
              case Some(_) if replace => "replace"
              case Some(_) => "unchanged"
            }
            if (action != "unchanged") { cur = Some(r.value); state.update(r.value) }
            out += ClassifiedValue(key, r.value, action)
          }
          out.iterator
      }
  }
}
