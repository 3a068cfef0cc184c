package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM (guide: one per suite via
  * lazy val; sharing across suites avoids N× startup in `sbt test`). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  /** AQE-aware executed-plan walk: descends into materialized query stages
    * (a plain `children` descent misses what `QueryStageExec` wraps).
    * Shared by every spec that asserts on plans. */
  def planSeq(p: SparkPlan): Seq[SparkPlan] = (p match {
    case a: AdaptiveSparkPlanExec => planSeq(a.executedPlan)
    case s: QueryStageExec => planSeq(s.plan)
    case other => other.children.flatMap(planSeq)
  }) :+ p

  def fileScans(df: DataFrame): Seq[FileSourceScanExec] =
    planSeq(df.queryExecution.executedPlan).collect { case f: FileSourceScanExec => f }

  def planNodeNames(df: DataFrame): Seq[String] =
    planSeq(df.queryExecution.executedPlan).map(_.nodeName)
}
