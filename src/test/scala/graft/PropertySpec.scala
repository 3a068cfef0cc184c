package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KeyedStore, Reshape}

/** Seeded randomized invariants (SURVEY §5.3): reshape round-trip and merge
  * algebra over generated station matrices. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  /** Random wide matrix: `n` stations × `d` days, ~20% nodata cells. */
  private def randomWide(n: Int, d: Int) = {
    val dates = (1 to d).map(i => f"2022-01-$i%02d")
    val rows = (1 to n).map { s =>
      val id = s"st$s"
      val cells = dates.map(_ => if (rnd.nextDouble() < 0.2) "NA"
        else BigDecimal(rnd.nextDouble() * 100).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString)
      (id +: cells).toList
    }
    val df = rows.map {
      case head :: tail => (head, tail)
      case Nil => sys.error("unreachable")
    }.toDF("skn", "cells")
    dates.zipWithIndex.foldLeft(df) { case (acc, (dt, i)) =>
      acc.withColumn(dt, col("cells").getItem(i))
    }.drop("cells")
  }

  test("property: pivot(unpivot(wide)) == wide for random matrices") {
    for (_ <- 1 to 3) {
      val wide = randomWide(n = 20, d = 8)
      val dates = wide.columns.filterNot(_ == "skn").toSeq
      val long = Reshape.unpivot(wide) // keeps NA cells as strings
      val back = long.groupBy(col("station_id").as("skn"))
        .pivot(col("date"), dates)
        .agg(first(col("value")))
      val orig = wide.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val rt = back.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(rt == orig)
    }
  }

  test("property: merge stats conserve and merge is idempotent on random increments") {
    val keys = Seq("datatype", "period", "date", "fill", "station_id")
    for (_ <- 1 to 3) {
      val inc = (1 to 60).map { i =>
        ("t", "day", f"2022-01-${rnd.nextInt(5) + 1}%02d", "raw",
          s"st${rnd.nextInt(20)}", rnd.nextInt(50).toDouble)
      }.toDF("datatype", "period", "date", "fill", "station_id", "value")
      val deduped = KeyedStore.dedupIncrement(inc, keys)
      val existing = deduped.limit(10)
        .withColumn("value", col("value") + (rnd.nextInt(2) * 100))
        .withColumn("uuid", concat(lit("u"), col("station_id"), col("date")))
      val st = KeyedStore.stats(KeyedStore.classify(deduped, existing, keys))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // conservation: actions partition the (deduped) increment
      assert(st.values.sum == deduped.count())
      val m1 = KeyedStore.merge(inc, existing, keys)
      // post-merge table: every increment key present exactly once, plus
      // untouched existing keys
      assert(KeyedStore.uniquenessViolations(m1, keys).isEmpty)
      val m2 = KeyedStore.merge(inc, m1, keys)
      assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
      // second-run classification is all-unchanged
      val st2 = KeyedStore.stats(KeyedStore.classify(deduped, m1, keys))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(st2.keySet == Set("unchanged"))
    }
  }
}
