package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Reshape
import graft.sources.WideMatrix

class WideMatrixReshapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val wide = WideMatrix.readCsv(spark, Fixtures.F1Csv)

  test("CSV scan: all columns string, station IDs preserve formatting") {
    assert(wide.schema.fields.forall(_.dataType.typeName == "string"))
    val ids = wide.select("SKN").collect().map(_.getString(0)).toSet
    assert(ids == Set("39.2", "147.0", "999.9")) // "39.2" stays a string
  }

  test("classify by name: 13 metadata cols + in-range date cols only") {
    val cls = WideMatrix.classifyByName(wide.columns.toSeq, Fixtures.F1Spec)
    assert(cls.metadataCols.size == 13)
    assert(cls.valueCols.map(_._2) == Seq("2022-03-01", "2022-03-02")) // 03-03 out of range
  }

  test("classify by position matches by-name for the canonical layout") {
    val byPos = WideMatrix.classifyByPosition(wide.columns.toSeq, Fixtures.F1Spec)
    val byName = WideMatrix.classifyByName(wide.columns.toSeq, Fixtures.F1Spec)
    assert(byPos.valueCols == byName.valueCols)
    assert(byPos.idCol == "SKN")
  }

  test("metadata projection: rename, nodata->null sparse, injected constants") {
    val m = WideMatrix.metadata(wide, Fixtures.F1Spec).collect()
    val row999 = WideMatrix.metadata(wide, Fixtures.F1Spec)
      .filter(col("skn") === "999.9").head()
    assert(row999.getAs[String]("observer") == null) // NA stripped
    assert(row999.getAs[String]("id_field") == "skn")
    assert(row999.getAs[String]("station_group") == "hawaii_climate_primary")
    assert(m.length == 3) // all-nodata station still yields a metadata doc
  }

  test("unpivot: one row per (station, date) cell; nodata dropped before cast") {
    val out = Reshape.pipeline(
      WideMatrix.valuesWide(wide, Fixtures.F1Spec), Fixtures.F1Spec).collect()
    assert(out.length == 3) // (39.2,03-01) (39.2,03-02) (147.0,03-01); 999.9 none
    val r = out.find(r => r.getAs[String]("station_id") == "39.2" &&
      r.getAs[String]("date") == "2022-03-01").get
    assert(r.getAs[Double]("value") == 17.2)
    assert(r.getAs[String]("datatype") == "temperature")
    assert(r.getAs[String]("aggregation") == "min")
  }

  test("unpivot with zero date columns ingests zero rows, not an AnalysisException") {
    import spark.implicits._
    // stale file in a rolling-window ingest: every header date out of
    // range -> valuesWide is skn-only; the reference's melt emits an
    // empty frame, so must we (Spark's raw unpivot would throw
    // UNPIVOT_REQUIRES_VALUE_COLUMNS)
    val sknOnly = Seq("39.2", "147.0").toDF("skn")
    val out = Reshape.unpivot(sknOnly)
    assert(out.columns.toSeq == Seq("station_id", "date", "value"))
    assert(out.count() == 0)
  }

  test("nodata is exact string equality: empty string is not NA") {
    import spark.implicits._
    val df = Seq(("s1", "", "NA", "1.5")).toDF("skn", "2022-03-01", "2022-03-02", "2022-03-03")
    val out = Reshape.filterNodata(Reshape.unpivot(df), "NA").collect()
    // "" survives the nodata filter (reference float("") would raise — strict
    // mode catches it at cast); "NA" is dropped.
    assert(out.map(_.getString(2)).toSet == Set("", "1.5"))
  }

  test("strict cast raises on non-numeric survivors") {
    import spark.implicits._
    val df = Seq(("s1", "abc")).toDF("skn", "2022-03-01")
    val strict = Reshape.castNumeric(Reshape.filterNodata(Reshape.unpivot(df), "NA"), strict = true)
    intercept[Exception](strict.collect())
    val lax = Reshape.castNumeric(Reshape.filterNodata(Reshape.unpivot(df), "NA"), strict = false)
    assert(lax.collect().head.get(2) == null)
  }

  test("empty CSV cells: unquoted -> dropped like short rows; quoted \"\" -> strict raise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/e.csv"),
      "SKN,X2022.03.01,X2022.03.02,X2022.03.03\ns1,,\"\",17.0\n")
    val wide = WideMatrix.readCsv(spark, s"$dir/e.csv")
    val spec = Fixtures.F1Spec.copy(dataColStart = 1, endDate = None)
    val long = Reshape.filterNodata(
      Reshape.unpivot(WideMatrix.valuesWide(wide, spec, byPosition = true)), "NA")
    // unquoted empty -> null -> dropped (documented divergence, P6 path);
    // quoted "" survives the nodata filter...
    assert(long.count() == 2)
    // ...and strict cast raises on it, mirroring the reference's float("")
    intercept[Exception](Reshape.castNumeric(long, strict = true).collect())
  }

  test("month-period fixture: default col layout, X%Y.%m headers") {
    val w2 = WideMatrix.readCsv(spark, Fixtures.F2Csv)
    val out = Reshape.pipeline(
      WideMatrix.valuesWide(w2, Fixtures.F2Spec, byPosition = true), Fixtures.F2Spec).collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[String]("date")).toSet ==
      Set("2021-11", "2021-12", "2022-01"))
  }
}
