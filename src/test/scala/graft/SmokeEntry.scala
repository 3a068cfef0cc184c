package graft

import org.apache.spark.sql.SparkSession

/** The driver's flagship smoke, runnable locally:
  * `sbt "Test/runMain graft.SmokeEntry"` — expects ENTRY_ROWS > 0. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
