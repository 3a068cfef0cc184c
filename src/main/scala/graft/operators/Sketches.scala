package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable sketch state for incremental corpus statistics.
 *
 * The approx twins (`distinct_counts_approx`, `value_quantiles_approx`)
 * recompute their sketches from raw data on every call — fine for one-shot
 * stats, wrong for a store that grows by increments: corpus-wide distinct
 * counts at 100 TB should NOT rescan every historical increment. The
 * incremental form: each increment persists a tiny per-group HLL sketch
 * row (binary register state, kilobytes per group — Spark's Datasketches
 * `hll_sketch_agg`), and corpus-wide stats come from merging the persisted
 * sketches (`hll_union_agg` — register-wise max), never touching raw rows
 * again.
 *
 * HLL union over same-`lgConfigK` sketches is LOSSLESS in the sketch
 * domain (registers are max-merged, insertion-order free), so merging
 * per-increment sketches yields byte-equivalent estimates to sketching
 * the concatenated corpus in one pass — asserted in CorpusSpec, along
 * with a parquet round-trip of the binary sketch column.
 *
 * Quantiles have no mergeable public form in Spark's function surface
 * (`percentile_approx` exposes only the final value, not its KLL state),
 * so incremental quantile state is scoped out until Spark exposes it;
 * `value_quantiles_approx` remains the bounded-memory one-shot form.
 */
object Sketches {

  /**
   * Per-increment sketch rows: one row per `groupCols` group carrying the
   * binary HLL state of `valueCol`'s distinct values plus an exact row
   * count (exact counts ARE mergeable — a plain sum). One map-side-
   * combined aggregation; persist the output alongside the increment
   * (the sketch column is plain `binary`, parquet-safe).
   */
  def hllIncrement(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as(s"${valueCol}_hll"),
        count(lit(1)).as("n_rows"))

  /**
   * Corpus-wide estimates from persisted increment sketches: group-wise
   * `hll_union_agg` + estimate, plus the summed row counts. Cost is
   * O(groups × increments) sketch rows — independent of corpus size.
   */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(s"${valueCol}_hll"), lit(false)))
          .as(s"${valueCol}_distinct"),
        sum(col("n_rows")).as("n_rows"))
}
