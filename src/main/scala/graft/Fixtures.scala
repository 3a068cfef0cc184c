package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.DatasetSpec
import graft.sources.WideMatrix

/**
 * Fixture definitions shared by queries, tests, and the parquet generator
 * (FIXTURES.md F-1..F-6). The parquet copies live under
 * `/root/repo/fixtures/parquet/` so the driver's DuckDB oracle reads byte-
 * identical inputs via `read_parquet` over the same files.
 */
object Fixtures {
  val Dir = "/root/repo/fixtures"
  val F1Csv = s"$Dir/f1_temperature_min_day.csv"
  val F2Csv = s"$Dir/f2_rainfall_month.csv"
  val WideParquet = s"$Dir/parquet/station_wide"
  val Wide2Parquet = s"$Dir/parquet/station_wide_month"
  val StoreParquet = s"$Dir/parquet/station_store"
  val StoreDupParquet = s"$Dir/parquet/station_store_dup"
  val MediaParquet = s"$Dir/parquet/media"
  val PiiParquet = s"$Dir/parquet/pii_docs"
  val ParaParquet = s"$Dir/parquet/para_docs"
  val MessyParquet = s"$Dir/parquet/messy_docs"
  val MarkupParquet = s"$Dir/parquet/markup_docs"

  /** Canonical job spec — FIXTURES.md F-3 / `example_config.json:13-32`. */
  val F1Spec: DatasetSpec = DatasetSpec(
    files = Seq(F1Csv),
    datatype = "temperature", period = "day", fill = "raw",
    dataColStart = 13, idCol = 0, nodata = "NA",
    startDate = Some(java.time.LocalDate.parse("2022-03-01")),
    endDate = Some(java.time.LocalDate.parse("2022-03-02")),
    additionalProperties = Map("aggregation" -> "min"),
    additionalKeyProperties = Seq("aggregation"))

  /** Month-period default-shape spec — FIXTURES.md F-2. */
  val F2Spec: DatasetSpec = DatasetSpec(
    files = Seq(F2Csv),
    datatype = "rainfall", period = "month", fill = "partial",
    dataColStart = 1, idCol = 0)

  def wide(spark: SparkSession): DataFrame = WideMatrix.readCsv(spark, F1Csv)

  /**
   * Pre-existing store table (F-5): seeded so the F-1 increment classifies
   * one row unchanged (39.2 @03-01), one replaced (39.2 @03-02 stored 99.9),
   * one created (147.0 @03-01 absent), plus an untouched bystander row.
   */
  def store(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("temperature", "day", "raw", "39.2", "2022-03-01", 17.2, "min", "u-0001"),
      ("temperature", "day", "raw", "39.2", "2022-03-02", 99.9, "min", "u-0002"),
      ("temperature", "day", "raw", "500.1", "2022-03-01", 5.0, "min", "u-0003"))
      .toDF("datatype", "period", "fill", "station_id", "date", "value", "aggregation", "uuid")
  }

  /** Store variant with a duplicated key — the `RecordKeyException` path (F-5). */
  def storeDup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    store(spark).unionByName(Seq(
      ("temperature", "day", "raw", "39.2", "2022-03-01", 18.0, "min", "u-0004"))
      .toDF("datatype", "period", "fill", "station_id", "date", "value", "aggregation", "uuid"))
  }

  /**
   * PII-laden corpus fixture (the synthetic `documents` table is word-salad
   * with no PII shapes, so redaction needs its own input). Each row
   * exercises one or more `TextFunctions.PiiPatterns` plus clean rows and
   * near-misses (a version string that looks IP-ish, a short digit run).
   * All addresses/numbers are RFC-5737/fictional-range style examples.
   */
  def piiDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "contact alice.smith@example.com for the quarterly report"),
      (1L, "servers 192.0.2.17 and 198.51.100.4 rotated their keys"),
      (2L, "call 555-867-5309 or 555 234 1122 before noon"),
      (3L, "card 4111111111111111 was declined; account 987654321 flagged"),
      (4L, "cc bob+spam@sub.mail.example.org and carol@example.net please"),
      (5L, "no identifiers here, just ordinary prose about weather"),
      (6L, "build v1.2.3.4000 shipped; ticket 1234 closed"),
      (7L, "fax 555.867.1234 listed next to 203.0.113.99 in the footer"),
      (8L, "ssn 123456789 must never appear in logs"),
      (9L, "mixed: dave@example.com at 192.0.2.200 dialed 555-000-1111"))
      .toDF("pii_id", "text")
  }

  /**
   * Multi-paragraph corpus fixture (the synthetic `documents` table is
   * single-paragraph word salad, so paragraph-level dedup needs its own
   * input). Boilerplate header/footer/cookie paragraphs repeat across
   * docs; doc 7 is boilerplate-only (vanishes entirely after dedup);
   * doc 3 repeats a paragraph within itself; docs 8/9 re-use body
   * paragraphs first seen in docs 0/1; doc 5 duplicates up to trimming;
   * doc 6 carries an empty paragraph (dropped by normalization).
   */
  def paraDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val header = "subscribe to our newsletter for weekly updates"
    val footer = "copyright example corp all rights reserved"
    val cookie = "this site uses cookies to improve your experience"
    Seq(
      (0L, Seq(header, "the first unique body paragraph about weather", footer)),
      (1L, Seq(header, "a second body paragraph describing the harbor", footer)),
      (2L, Seq("standalone prose with no boilerplate at all")),
      (3L, Seq("a repeated stanza inside one document",
               "a repeated stanza inside one document",
               "plus a distinct middle paragraph", cookie)),
      (4L, Seq(cookie, header, "fourth document body text on navigation menus")),
      (5L, Seq("  surrounded by spaces this paragraph is  ",
               "surrounded by spaces this paragraph is")),
      (6L, Seq("sixth doc only paragraph", "", footer)),
      (7L, Seq(header, footer, cookie)),
      (8L, Seq("eighth doc opens fresh", "the first unique body paragraph about weather")),
      (9L, Seq("a second body paragraph describing the harbor", "ninth doc closer")))
      .map { case (id, ps) => (id, ps.mkString("\n\n")) }
      .toDF("doc_id", "text")
  }

  /** Messy-text fixture for the normalization oracle (`text_normalize`):
    * curly punctuation, CRLF/CR endings, control bytes, NBSP, ragged
    * whitespace, over-long paragraph gaps — each row exercises one rule
    * of `TextFunctions.NormalizePatterns`, plus an already-clean row and
    * an empty row as identities. */
  def messyDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "plain text stays untouched"),
      (1L, "curly ‘quotes’ and “double” ones"),
      (2L, "dashes – en and — em — folded"),
      (3L, "windows\r\nline\rendings"),
      (4L, "control\u0001chars\u0007here\u001Ftoo\u007F"),
      (5L, "nbsp\u00A0separated\u00A0words"),
      (6L, "  leading and trailing   "),
      (7L, "tabs\t\tand   space \t runs"),
      (8L, "para one\n\n\n\n\npara two"),
      (9L, " spaces \n around \n newlines "),
      (10L, "\n\nleading newlines and trailing\n\n"),
      (11L, ""))
      .toDF("doc_id", "text")
  }

  /** Markup-laden fixture for the stripping oracle (`text_strip_markup`):
    * each row exercises one rule of `TextFunctions.MarkupPatterns` —
    * tags, script/style bodies, comments spanning lines, entity escapes
    * (including the double-escape that must decode exactly once),
    * mixed-case tags — plus a plain row and an empty row as identities. */
  def markupDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "plain prose stays exactly as is"),
      (1L, "<p>a paragraph</p> and <b>bold</b> text"),
      (2L, "<script type=\"text/javascript\">var x = 1 < 2;</script>visible body"),
      (3L, "<style>.cls { color: red }</style>styled body"),
      (4L, "before<!-- hidden\ncomment -->after"),
      (5L, "entities &amp; escapes: 1 &lt; 2 &gt; 0 &quot;q&quot; &apos;a&apos; &#39;b&#39; x&nbsp;y"),
      (6L, "double escape &amp;lt; decodes once"),
      (7L, "<div class=\"a\"><ul><li>one</li><li>two</li></ul></div>"),
      (8L, "<SCRIPT>upperCase()</SCRIPT>mixed <B>tags</B> here"),
      (9L, "unclosed <em tag stays? and a lone > sign"),
      (10L, ""))
      .toDF("doc_id", "text")
  }

  /**
   * Multimodal fixture: opaque binary payloads + typed metadata. Payload
   * bytes are a deterministic pseudo-image (no real codecs in this
   * container); the Spark-side plumbing (binary column, metadata, batch
   * shape) is real.
   */
  def media(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 64).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val w = 32 + (i % 4) * 16
      val h = 32 + (i % 3) * 16
      val payload = Array.tabulate[Byte](w * h % 997 + 64)(j => ((i * 131 + j * 31) % 251).toByte)
      (i.toLong, kind, payload, w, h, 16000 + (i % 3) * 8000, s"doc-${i % 16}")
    }.toDF("media_id", "kind", "payload", "width", "height", "sample_rate", "doc_ref")
  }
}

/** One-shot generator: writes the parquet fixtures the oracle reads. */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.wide(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.WideParquet)
    WideMatrix.readCsv(spark, Fixtures.F2Csv).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.Wide2Parquet)
    Fixtures.store(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.StoreParquet)
    Fixtures.storeDup(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.StoreDupParquet)
    graft.operators.Multimodal.withByteStats(Fixtures.media(spark)).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.MediaParquet)
    Fixtures.piiDocs(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.PiiParquet)
    Fixtures.paraDocs(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.ParaParquet)
    Fixtures.messyDocs(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.MessyParquet)
    Fixtures.markupDocs(spark).coalesce(1)
      .write.mode("overwrite").parquet(Fixtures.MarkupParquet)
    spark.stop()
  }
}
