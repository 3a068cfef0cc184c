package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.JobConfig

/**
 * CLI entry point — the engine's equivalent of the reference's container
 * run (`utils/task.sh` → date templating → `driver.py config.json`,
 * SURVEY §3.3):
 *
 *   spark-submit --class graft.Main engine.jar <config.json> <storeRoot> \
 *       [--by-position] [--date YYYY-MM-DD]
 *
 * The config is read, `%y/%m/%d` placeholders are templated (yesterday by
 * default, `--date` overrides — `utils/update_date_string_in_config.py`
 * semantics), and every dataset file is ingested with per-file
 * create/replace/unchanged stats printed as JSON lines.
 */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Main <config.json> <storeRoot> [--by-position] [--date YYYY-MM-DD]")
    val configPath = args(0)
    val storeRoot = args(1)
    val byPosition = args.contains("--by-position")
    val date = args.sliding(2).collectFirst {
      case Array("--date", d) => java.time.LocalDate.parse(d)
    }.getOrElse(java.time.LocalDate.now.minusDays(1))

    val raw = Files.readString(Paths.get(configPath))
    val cfg = JobConfig.parse(JobConfig.templateDates(raw, date))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${Runtime.getRuntime.availableProcessors}]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = IngestJob.run(spark, cfg, storeRoot, byPosition)
    results.foreach { r =>
      println(s"""{"file":"${r.file}","created":${r.created},"replaced":${r.replaced},""" +
        s""""unchanged":${r.unchanged},"metadata_rows":${r.metadataRows}}""")
    }
    println(s"""{"all_complete":${IngestJob.allComplete(spark, storeRoot)}}""")
    spark.stop()
  }
}
