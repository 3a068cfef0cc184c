package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Small deterministic event set: 2 users, bursts separated by >30min. */
  private lazy val events = {
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 1.0),
      (2L, "2024-01-01 00:10:00", 10L, "click", 2.0),
      (3L, "2024-01-01 01:00:00", 10L, "view", 3.0), // 50min gap -> new session
      (4L, "2024-01-01 00:05:00", 20L, "view", 4.0),
      (5L, "2024-01-01 02:00:00", 20L, "purchase", 5.0),
      (6L, "2024-01-01 02:20:00", 20L, "view", 6.0))
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
  }

  test("batch sessionization: gap>30min splits; aggregates per session") {
    val out = StreamingOps.sessionizeBatch(events, gapMin = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(out.size == 4)
    assert(out((10L, 0L)) == (2L, 3.0)) // first burst of user 10
    assert(out((10L, 1L)) == (1L, 3.0))
    assert(out((20L, 0L)) == (1L, 4.0))
    assert(out((20L, 1L)) == (2L, 11.0))
  }

  test("batch sessionization matches session_window on sub-second and exact-gap boundaries") {
    // unix_timestamp truncates to whole seconds: a 1800.5s gap read as
    // 1800 merged where session_window split — the batch form must gap on
    // full-precision seconds. And at EXACTLY gap, session_window merges
    // (end-inclusive interval join), so strict `>` is the right comparator.
    val subSec = Seq(
      (1L, "2024-01-01 00:00:00.100", 10L, "view", 1.0),
      (2L, "2024-01-01 00:30:00.100", 10L, "view", 1.0), // diff == 1800.000s: merge
      (3L, "2024-01-01 00:00:00.100", 20L, "view", 1.0),
      (4L, "2024-01-01 00:30:00.600", 20L, "view", 1.0)) // diff 1800.5s: split
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val batch = StreamingOps.sessionizeBatch(subSec, gapMin = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq.sorted
    assert(batch == Seq((10L, 2L), (20L, 1L), (20L, 1L)))
    // and the streaming twin agrees on the same input
    val dir = Files.createTempDirectory("graft_stream_subsec").toString
    subSec.write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.readEventStream(spark, dir, subSec.schema)
    val q = StreamingOps.sessionizeStream(stream, gapMin = 30)
      .writeStream.format("memory").queryName("sess_subsec")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("sess_subsec").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq.sorted
    assert(streamed == batch)
  }

  test("streaming windowed counts equal the batch aggregation (AvailableNow)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.readEventStream(spark, dir, events.schema)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("win_out").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("ws"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    val batch = StreamingOps.windowedCounts(events).collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("ws"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming session_window agrees with batch sessionization boundaries") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.readEventStream(spark, dir, events.schema)
    val q = StreamingOps.sessionizeStream(stream, gapMin = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val sessions = spark.table("sess_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    assert(sessions == Set((10L, 2L, 3.0), (10L, 1L, 3.0), (20L, 1L, 4.0), (20L, 2L, 11.0)))
  }

  test("stateful streaming upsert-classify: create/unchanged/replace across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamingOps.{ClassifiedValue, KeyedValue}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedValue]
    val q = StreamingOps.classifyStream(in.toDS())
      .writeStream.format("memory").queryName("cls_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(KeyedValue("k1", 1.0), KeyedValue("k2", 2.0))
      q.processAllAvailable()
      in.addData(KeyedValue("k1", 1.0), KeyedValue("k2", 9.0), KeyedValue("k3", 3.0))
      q.processAllAvailable()
      val out = spark.table("cls_out").as[ClassifiedValue].collect()
        .groupBy(c => (c.k, c.value)).view.mapValues(_.map(_.action).toSeq).toMap
      assert(out(("k1", 1.0)) == Seq("create", "unchanged"))
      assert(out(("k2", 2.0)) == Seq("create"))
      assert(out(("k2", 9.0)) == Seq("replace"))
      assert(out(("k3", 3.0)) == Seq("create"))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops key dupes") {
    val dir = Files.createTempDirectory("graft_stream3").toString
    events.unionByName(events).write.mode("overwrite").parquet(dir) // every event twice
    val stream = StreamingOps.readEventStream(spark, dir, events.schema)
    val q = StreamingOps.dedupWithinWatermark(stream, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("dedup_out").count() == 6)
  }
}
