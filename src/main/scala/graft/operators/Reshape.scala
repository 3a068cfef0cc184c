package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


import graft.config.DatasetSpec

/**
 * Wide→long reshape + the value-side scalar pipeline (SURVEY §2.2, §2.5).
 *
 * The reference does this twice — columnar (`driver.py:156-166`, pandas
 * melt) and row-streaming (`tapis_direct_driver.py:133-167`) — both collapse
 * to one declarative unpivot here; Spark plans it as a single `Expand` node
 * inside whole-stage codegen, so the columnar and row forms are the same
 * physical plan.
 */
object Reshape {

  /**
   * Unpivot (R1/R2): one row per (station, date) cell. Input: wide frame
   * from `WideMatrix.valuesWide` (columns: `skn`, then ISO-date-named value
   * columns, all string). Output columns: `station_id, date, value` (value
   * still raw string — nodata filter must see the raw cell).
   */
  def unpivot(valuesWide: DataFrame): DataFrame = {
    val dateCols = valuesWide.columns.filterNot(_ == "skn")
    if (dateCols.isEmpty) {
      // zero in-range date columns (stale file in a rolling-window ingest,
      // wrong-period config): ingest zero rows like the reference's empty
      // melt, not Spark's UNPIVOT_REQUIRES_VALUE_COLUMNS AnalysisException
      valuesWide.select(col("skn").as("station_id"),
        lit(null).cast("string").as("date"),
        lit(null).cast("string").as("value")).limit(0)
    } else valuesWide
      .unpivot(Array(col("skn")), dateCols.map(col), "date", "value")
      .withColumnRenamed("skn", "station_id")
  }

  /**
   * nodata filter (P5) — exact string equality with the sentinel, applied to
   * the RAW cell before any cast (`driver.py:162`;
   * `tapis_direct_driver.py:141-143`). Null cells (missing trailing fields
   * in a short CSV row, P6) are dropped too, matching the row-guard.
   */
  def filterNodata(long: DataFrame, nodata: String): DataFrame =
    long.filter(col("value").isNotNull && col("value") =!= lit(nodata))

  /**
   * Numeric cast (P7). The reference is strict (`float(value)` raises on
   * garbage, `tapis_direct_driver.py:145`); Spark casts permissively to
   * null, so `strict=true` asserts no surviving cell failed the cast.
   */
  def castNumeric(long: DataFrame, strict: Boolean = true): DataFrame = {
    // try_cast is mode-independent (plain cast THROWS under Spark 4's
    // default ANSI mode and nulls under legacy — neither is controllable
    // from library code). Strictness is then an explicit in-expression
    // assertion: raise on cells that fail the cast, inside codegen, no
    // extra pass.
    val tried = expr("try_cast(value AS DOUBLE)")
    val v =
      if (strict)
        when(col("value").isNotNull && tried.isNull,
          raise_error(concat(lit("non-numeric value cell: "), col("value"))))
          .otherwise(tried)
      else tried
    long.withColumn("value", v)
  }

  /** Static-property enrichment (P8): attach constant columns to every row. */
  def enrich(long: DataFrame, props: Map[String, String]): DataFrame = {
    // Single select instead of N withColumn calls -- one Project node.
    val statics: Seq[Column] = props.toSeq.sortBy(_._1).map { case (k, v) => lit(v).as(k) }
    long.select(col("*") +: statics: _*)
  }

  /**
   * Full value pipeline: wide → long → nodata-filter → cast → enrich
   * (`driver.py:156-166` end to end). Output is the engine's fact schema
   * (FIXTURES.md F-4): station_id, date, value + static property columns.
   *
   * `strict` defaults TRUE to match the reference: a non-nodata cell that
   * fails the numeric parse aborts the run (`float(value)` raises,
   * `tapis_direct_driver.py:145`) instead of silently becoming NULL. Pass
   * `strict = false` only where a query deliberately wants lax semantics.
   */
  def pipeline(valuesWide: DataFrame, spec: DatasetSpec, strict: Boolean = true): DataFrame =
    enrich(castNumeric(filterNodata(unpivot(valuesWide), spec.nodata), strict),
      spec.staticProperties)
}
