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

final case class JobConfig(
    data: Seq[DatasetSpec],
    docName: String = "hcdp_station_value",
    location: String = "hawaii")

object JobConfig {
  private val mapper = new ObjectMapper()

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  /** Parse the reference's JSON config shape. */
  def parse(json: String): JobConfig = {
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
          ap.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
        }.getOrElse(Map.empty),
        additionalKeyProperties = Option(d.get("additional_key_properties"))
          .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
        replaceDuplicates = Option(d.get("replace_duplicates")).forall(_.asBoolean),
        writeMetadata = Option(d.get("write_metadata")).forall(_.asBoolean))
    }
    val location = Option(root.get("additional_properties"))
      .flatMap(ap => optText(ap, "location")).getOrElse("hawaii")
    JobConfig(data = data, location = location)
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
