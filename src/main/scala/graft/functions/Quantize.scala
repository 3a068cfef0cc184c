package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Engine-version-stable decimal quantization — the drop-in replacement
 * for `round(x, k)` on every oracle-checked score emission.
 *
 * Why not `round`: Spark's ROUND on doubles goes through
 * `BigDecimal.setScale(k, HALF_UP)` (exact decimal conversion of the
 * double, then half-up), while DuckDB's rounds via
 * `std::round(x * 10^k) / 10^k` — different algorithms whose agreement
 * is empirical, not guaranteed, and DuckDB's has changed across
 * releases. A driver-side DuckDB upgrade can flip a rounded emission's
 * hash with zero repo changes (this class of fragility kept
 * `corpus_report` red for two rounds).
 *
 * `quantize` instead uses ONLY operations IEEE 754 pins to
 * correctly-rounded results — multiply, add, floor, divide — which
 * every engine implements bit-identically:
 *
 *   quantize(x, k) = floor(x · 10ᵏ + 0.5) / 10ᵏ
 *
 * (round-half-up toward +∞, one well-defined double result). The SQL
 * twin ([[sql]]) spells the identical expression for DuckDB, so both
 * sides compute the same bytes on any engine version. 10ᵏ is exactly
 * representable for k ≤ 22; emitted scores here use k ≤ 6.
 *
 * Residual risk: if the UNQUANTIZED score differs across engines in the
 * last ulp (transcendental inputs — ln; or sum-order noise), a value
 * within ~1 ulp of a 0.5·10⁻ᵏ boundary can still flip — probability
 * ~1e-10 per row, the irreducible floor for any fixed-point emission of
 * inexact doubles, vs the SYSTEMATIC version-drift `round` carries.
 */
object Quantize {

  /** floor(x·10ᵏ + 0.5)/10ᵏ as a Column (double). Spark's `floor`
    * yields LONG; for |y| < 2⁵³ that is exact and converts back to
    * double exactly. For |y| ≥ 2⁵³ a double is already integral — the
    * mathematical floor IS y — so y passes through directly instead of
    * riding the long conversion, which would saturate at 2⁶³
    * (Long.MaxValue) while DuckDB's all-double floor does not; this also
    * covers x·10ᵏ overflowing to ±∞ (both engines then emit ±∞).
    *
    * NON-FINITE inputs pass through untouched: Spark's long-valued floor
    * would map NaN → 0 and ±∞ → Long.{Max,Min}Value while DuckDB's
    * double floor propagates them — a NaN score (cosine of a zero-norm
    * vector, 0/0 ratios) must diverge LOUDLY in both engines (NaN on
    * both sides, which the canonicalized compare treats consistently),
    * not quantize to a plausible 0.0 on one side only. [[sql]] mirrors
    * the same guard. */
  def quantize(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 6, s"quantize scale out of supported range: $k")
    val p = math.pow(10, k)
    val nonFinite = isnan(c) || c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity)
    val y = c * lit(p) + lit(0.5)
    val twoTo53 = 9007199254740992.0 // 2^53: every double >= this is integral
    when(nonFinite, c).otherwise(
      when(abs(y) >= lit(twoTo53), y / lit(p))
        .otherwise(floor(y) / lit(p)))
  }

  /** The common 6-decimal score form. */
  def q6(c: Column): Column = quantize(c, 6)

  /** DuckDB twin: the same IEEE expression, spelled in SQL (with the
    * same non-finite passthrough as [[quantize]]). */
  def sql(expr: String, k: Int): String = {
    require(k >= 0 && k <= 6, s"quantize scale out of supported range: $k")
    s"(CASE WHEN isnan($expr) OR isinf($expr) THEN ($expr) " +
      s"ELSE floor(($expr) * 1e$k + 0.5) / 1e$k END)"
  }

  def sql6(expr: String): String = sql(expr, 6)
}
