package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Quantize

/**
 * Multimodal (image/audio/video) column handling: payloads are opaque
 * `binary` columns traveling WITH typed metadata; decode / feature-extract /
 * resize / frame-sample run as partition-batched typed transformations.
 *
 * The Spark-side plumbing is real — schema, encoders, partition batching,
 * selective decode — but the codec itself is a clearly-marked deterministic
 * STUB (`fakeDecode`): no image/audio libraries exist in this container. In
 * production the stub body is the only thing that changes (swap in the real
 * decoder per `kind`); everything around it — including the contract that
 * decode happens once per partition-batch with bounded memory — stays.
 *
 * Scale notes: payload bytes dominate IO, so (1) metadata-only queries must
 * never touch the binary column — parquet column pruning guarantees that
 * when decode stays out of the projection; (2) decode is mapPartitions, not
 * per-row UDF, so per-batch init cost (real codecs are expensive to open)
 * amortizes; (3) partition sizing by `maxPartitionBytes` keeps a batch's
 * decoded frames in executor memory.
 */
object Multimodal {

  /** Input row: binary payload + typed metadata (fixtures `media` table). */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, doc_ref: String)

  /** Extracted features: one row per media item. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      thumb_w: Int, thumb_h: Int, frames_sampled: Int, feature: Array[Float])

  /**
   * STUB decode — deterministic fake standing in for a real codec. Derives
   * a stable checksum + fixed-length "feature vector" from the payload
   * bytes so downstream operators (similarity, dedup) are exercised with
   * realistic shapes and reproducible values.
   */
  private def fakeDecode(payload: Array[Byte], featureDim: Int): (Long, Array[Float]) = {
    var h = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val feat = Array.tabulate(featureDim) { d =>
      val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      ((x % 1000L).toFloat) / 1000.0f
    }
    (h, feat)
  }

  /** Thumbnail dims preserving aspect, bounded at `maxSide` (resize step). */
  private def thumbDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /**
   * Decode + feature-extract + resize + frame-sample in one partition-
   * batched pass. `frames_sampled` applies to video only (1 per ~4 KiB of
   * payload, capped) — the batch shape a real frame sampler would have.
   */
  def extractFeatures(media: DataFrame, featureDim: Int = 16, thumbMax: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens HERE (real codec handle / model load)
      rows.map { r =>
        val (checksum, feat) = fakeDecode(r.payload, featureDim)
        val (tw, th) = thumbDims(r.width, r.height, thumbMax)
        val frames = if (r.kind == "video")
          math.min(32, math.max(1, r.payload.length / 4096)) else 0
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, checksum,
          tw, th, frames, feat)
      }
    }
  }

  /**
   * Stamp byte-size metadata at media-WRITE time: `n_bytes` rides next to
   * the payload so every later metadata query (stats, size filters, skew
   * planning) aggregates a long column instead of scanning the binary one.
   * At 100 TB the payload column IS the table — paying `length()` once on
   * ingest is the difference between a KB-scale and a TB-scale stats query.
   */
  def withByteStats(media: DataFrame): DataFrame =
    media.withColumn("n_bytes", length(col("payload")).cast("long"))

  /**
   * Metadata-only stats: aggregates the PERSISTED `n_bytes` column (stamped
   * by `withByteStats` on ingest) — the payload column is never read, and
   * the parquet scan's ReadSchema excludes it (plan-asserted in
   * TrainingDataOpsSpec). A frame lacking `n_bytes` fails resolution loudly
   * rather than silently falling back to a payload scan.
   */
  def stats(media: DataFrame): DataFrame = {
    require(media.columns.contains("n_bytes"),
      "Multimodal.stats needs the persisted n_bytes column — stamp it at " +
        "write time with Multimodal.withByteStats (metadata queries must " +
        "never scan payload bytes)")
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(col("n_bytes")).as("total_bytes"),
      Quantize.quantize(avg(col("width")), 4).as("avg_w"),
      Quantize.quantize(avg(col("height")), 4).as("avg_h"))
  }
}
