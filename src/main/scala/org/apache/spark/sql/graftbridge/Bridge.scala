package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ catalyst Expression bridge. Spark 4 split `Column` from catalyst
 * (Connect); the conversion helpers are `private[sql]`, so this one-file
 * subpackage of `org.apache.spark.sql` re-exposes exactly the two
 * conversions a library defining native expressions needs — the same
 * technique Spark-ecosystem libraries use for custom `Expression`s.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalog metadata for a table name, structurally (bucket spec, partition
    * columns) — `sessionState` is `private[sql]`, and the alternative of
    * string-parsing `DESCRIBE TABLE EXTENDED` output mis-parses column names
    * containing commas/backticks and couples to the describe rendering. */
  def tableMetadata(spark: org.apache.spark.sql.SparkSession,
      table: String): org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.catalog.getTableMetadata(
      classic.sessionState.sqlParser.parseTableIdentifier(table))
  }
}
