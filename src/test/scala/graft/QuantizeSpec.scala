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

  test("quantize: large magnitudes follow double floor, not Long saturation") {
    // |x·10^6| >= 2^63 used to saturate Spark's long-valued floor at
    // Long.MaxValue while DuckDB's double floor does not; doubles >= 2^53
    // are integral, so the mathematical floor IS the value
    val rows = Seq(1e19, -1e19, 9.3e9, 1.6e308).toDF("x")
    val out = rows.select(Quantize.quantize(col("x"), 6).as("q"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 1e19, s"got ${out(0)}")   // not 9.223372036854776e12
    assert(out(1) == -1e19, s"got ${out(1)}")
    // 9.3e9: y = 9.3e15 in (2^53, 2^63) — long floor was exact here, the
    // integral passthrough must produce the identical value
    assert(out(2) == Math.floor(9.3e9 * 1e6 + 0.5) / 1e6, s"got ${out(2)}")
    // x·10^6 overflows to +inf: both engines emit +inf (floor(inf)=inf)
    assert(out(3).isPosInfinity, s"got ${out(3)}")
    // and the sub-2^53 range is bit-unchanged by the guard
    val small = Seq(1.2345675, -987654.3210985).toDF("x")
      .select(Quantize.quantize(col("x"), 6)).collect().map(_.getDouble(0))
    assert(small(0) == 1.234568 && small(1) == -987654.321098)
  }

  test("quantize SQL twin spells the same guard") {
    val s = Quantize.sql6("x")
    assert(s.contains("isnan(x)") && s.contains("isinf(x)"))
    assert(s.contains("floor((x) * 1e6 + 0.5) / 1e6"))
  }
}
