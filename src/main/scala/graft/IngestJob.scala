package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.config.{DatasetSpec, JobConfig}
import graft.operators.{KeyedStore, Reshape}
import graft.sources.WideMatrix

/**
 * Config-driven ingestion job — the engine's unification of the reference's
 * three entry points (SURVEY §3): `driver.py` (columnar path, by-name
 * classification), `tapis_direct_driver.py` (row path, by-position
 * classification) and the containerized scheduled run (`utils/task.sh` +
 * date templating, handled by `JobConfig.templateDates` upstream).
 *
 * Store layout: `$root/values` — parquet partitioned by `date` (daily
 * increments rewrite only their partitions); `$root/metadata` — unpartitioned
 * keyed table on `skn`; `$root/state/` JSON files — per-file completion markers
 * matching the reference's state-file contract (`README.md:41-43`,
 * `utils/all_complete.py:4-12`).
 */
object IngestJob {

  final case class FileResult(file: String, created: Long, replaced: Long,
      unchanged: Long, metadataRows: Long)

  def valuesDir(root: String) = s"$root/values"
  def metadataDir(root: String) = s"$root/metadata"
  def stateDir(root: String) = s"$root/state"

  /** Run one dataset file through scan → classify → reshape → MERGE. */
  def runFile(spark: SparkSession, ds: DatasetSpec, file: String, root: String,
      location: String, byPosition: Boolean): FileResult = {
    val wide = WideMatrix.readCsv(spark, file)

    val metaRows = if (ds.writeMetadata && !byPosition) {
      val meta = WideMatrix.metadata(wide, ds, location)
      KeyedStore.mergeIntoTable(meta, metadataDir(root), Seq("skn"), partitionCol = None)
      meta.count()
    } else 0L

    val values = Reshape.pipeline(WideMatrix.valuesWide(wide, ds, byPosition), ds)
    val st = KeyedStore.mergeIntoTable(values, valuesDir(root), ds.keyFields,
      partitionCol = Some("date"), replace = ds.replaceDuplicates)

    writeState(spark, root, file, complete = true)
    FileResult(file, st.created, st.replaced, st.unchanged, metaRows)
  }

  /** Run the whole job config (outer loop over datasets × files —
    * `driver.py:101,136`). */
  def run(spark: SparkSession, cfg: JobConfig, root: String,
      byPosition: Boolean = false): Seq[FileResult] =
    for (ds <- cfg.data; f <- ds.files)
      yield runFile(spark, ds, f, root, cfg.location, byPosition)

  /** Per-file state marker (resume contract, `README.md:41-43`). */
  private def writeState(spark: SparkSession, root: String, file: String,
      complete: Boolean): Unit = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(stateDir(root)))
    val name = java.util.UUID.nameUUIDFromBytes(file.getBytes("UTF-8")).toString
    val out = fs.create(new Path(s"${stateDir(root)}/$name.json"), true)
    out.write(s"""{"file": "$file", "complete": $complete}""".getBytes("UTF-8"))
    out.close()
  }

  /** all-complete fold (A7; `utils/all_complete.py:4-12`): AND over the
    * `complete` flag of every state file. */
  def allComplete(spark: SparkSession, root: String): Boolean = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(stateDir(root))
    if (!fs.exists(dir)) false
    else {
      val files = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".json"))
      files.nonEmpty && files.forall { f =>
        val in = fs.open(f.getPath)
        val body = new String(
          in.readAllBytes(), "UTF-8")
        in.close()
        body.contains("\"complete\": true")
      }
    }
  }
}
