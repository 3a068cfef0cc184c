package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Quantize

/** Pins the engine-stable quantization contract: IEEE half-up at k
  * decimals for finite doubles, loud passthrough for non-finite ones
  * (Spark's long-valued floor would silently map NaN → 0.0 and ±∞ to
  * Long bounds, diverging from the DuckDB twin). */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("quantize: finite half-up, non-finite passthrough") {
    val rows = Seq(1.2345675, -1.2345675, 0.0, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity).toDF("x")
    val out = rows.select(Quantize.quantize(col("x"), 6).as("q"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 1.234568) // ties round toward +inf
    assert(out(1) == -1.234567)
    assert(out(2) == 0.0)
    assert(out(3).isNaN, "NaN must propagate, not quantize to 0.0")
    assert(out(4).isPosInfinity)
    assert(out(5).isNegInfinity)
    // null stays null
    val n = Seq[Option[Double]](None).toDF("x")
      .select(Quantize.quantize(col("x"), 6).as("q")).collect()
    assert(n(0).isNullAt(0))
  }

  test("quantize SQL twin spells the same guard") {
    val s = Quantize.sql6("x")
    assert(s.contains("isnan(x)") && s.contains("isinf(x)"))
    assert(s.contains("floor((x) * 1e6 + 0.5) / 1e6"))
  }
}
