package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/**
 * Configuration for the end-to-end training-set job
 * (`graft.TrainingSetJob`) — the training-data analog of the reference's
 * ingestion config ([[JobConfig]]): one JSON document declares the whole
 * clean → decontaminate → redact → rebalance → split → chunk → pack →
 * shard pipeline. Every default matches the corresponding operator's
 * default, so an empty `{}` config runs the same pipeline as
 * `Corpus.cleanCorpus(docs)` plus packing and sharding at their
 * defaults.
 */
final case class TrainingSetConfig(
    stripMarkup: Boolean = false,
    normalize: Boolean = false,
    lang: String = "en",
    minTokens: Long = 10,
    maxDigitRatio: Double = 0.3,
    ngram: Int = 3,
    minJaccard: Double = 0.5,
    maxDf: Option[Long] = None,
    softDedup: Boolean = false,
    evalDir: Option[String] = None,
    evalMinOverlap: Long = 5,
    redact: Boolean = false,
    strataCol: Option[String] = None,
    strataRates: Map[String, Int] = Map.empty,
    strataDefaultPct: Int = 100,
    capPerStratum: Option[Int] = None,
    capStrataCol: String = "source",
    c4Clean: Boolean = false,
    gopherGate: Boolean = false,
    lmRefDropQ: Option[Double] = None,
    lmRefDir: Option[String] = None,
    lmRefLambda: Double = 0.9,
    lmRefMinBigram: Option[Long] = None,
    lmRefStrataCol: Option[String] = None,
    substrWindow: Option[Int] = None,
    mixWeights: Map[String, Double] = Map.empty,
    mixAlpha: Option[Double] = None,
    mixBudget: Double = 0.0,
    mixStrataCol: String = "source",
    mixRepeats: Boolean = false,
    dsirTopK: Option[Int] = None,
    dsirTargetCol: String = "source",
    dsirTargetValue: Option[String] = None,
    sampleK: Option[Int] = None,
    sampleWeightCol: String = "n_chars",
    chunkBudget: Int = 512,
    chunkStride: Option[Int] = None,
    chunkSentences: Boolean = false,
    bpeMergesPath: Option[String] = None,
    bpeTrainMerges: Option[Int] = None,
    emitIds: Boolean = false,
    emitBoundaries: Boolean = false,
    packGroups: Int = 32,
    nShards: Int = 64,
    compactEvery: Option[Int] = None,
    checkpointDir: Option[String] = None) {
  require(compactEvery.forall(_ > 0),
    s"compact_every must be positive: $compactEvery")
  require(bpeMergesPath.isEmpty || bpeTrainMerges.isEmpty,
    "bpe_merges_path and bpe_train_merges are mutually exclusive")
  require(bpeTrainMerges.forall(_ > 0),
    s"bpe_train_merges must be positive: $bpeTrainMerges")
  require((mixWeights.nonEmpty || mixAlpha.nonEmpty) == (mixBudget > 0),
    "a mixture (mix_weights or mix_alpha) and mix_budget come together")
  require(mixWeights.isEmpty || mixAlpha.isEmpty,
    "mix_weights and mix_alpha are mutually exclusive mixture stages")
  require(mixAlpha.forall(a => a > 0 && a <= 1),
    s"mix_alpha must be in (0, 1]: $mixAlpha")
  require(!mixRepeats || mixWeights.nonEmpty || mixAlpha.nonEmpty,
    "mix_repeats requires a mixture (mix_weights or mix_alpha)")
  require(chunkBudget > 0, s"chunk_budget must be positive: $chunkBudget")
  require(chunkStride.forall(st => st > 0 && st <= chunkBudget),
    s"chunk_stride must be in [1, chunk_budget]: $chunkStride")
  require(chunkStride.isEmpty || (bpeMergesPath.isEmpty && bpeTrainMerges.isEmpty),
    "chunk_stride (overlapping windows) and BPE cost budgets are mutually " +
      "exclusive — the cost-aware chunker has no stride form")
  require(!chunkSentences || (chunkStride.isEmpty && bpeMergesPath.isEmpty &&
    bpeTrainMerges.isEmpty && !emitIds),
    "chunk_sentences is exclusive with chunk_stride and the BPE cost/id " +
      "paths — sentence atoms pack on whitespace-token costs")
  require(!emitIds || chunkStride.isEmpty,
    "emit_ids and chunk_stride are mutually exclusive — id emission rides " +
      "the BPE cost path (size(token_ids) == n_tokens), which has no " +
      "stride form")
  require(nShards > 0, s"n_shards must be positive: $nShards")
  require(substrWindow.forall(_ >= 2),
    s"substr_window must be >= 2 tokens: $substrWindow")
  require(lmRefDropQ.forall(q => q > 0 && q < 1),
    s"lm_ref_drop_q must be in (0,1): $lmRefDropQ")
  require(lmRefLambda > 0 && lmRefLambda < 1,
    s"lm_ref_lambda must be in (0,1): $lmRefLambda")
  require(lmRefMinBigram.forall(_ >= 1),
    s"lm_ref_min_bigram must be >= 1: $lmRefMinBigram")
  require(lmRefDir.isEmpty || lmRefDropQ.nonEmpty,
    "lm_ref_dir without lm_ref_drop_q does nothing — set the drop quantile")
  require(lmRefMinBigram.isEmpty || lmRefDropQ.nonEmpty,
    "lm_ref_min_bigram without lm_ref_drop_q does nothing — set the drop " +
      "quantile")
  require(lmRefLambda == 0.9 || lmRefDropQ.nonEmpty,
    "lm_ref_lambda without lm_ref_drop_q does nothing — set the drop " +
      "quantile")
  require(lmRefStrataCol.isEmpty || lmRefDropQ.nonEmpty,
    "lm_ref_strata_col without lm_ref_drop_q does nothing — set the drop " +
      "quantile")
  require(capPerStratum.forall(_ > 0),
    s"cap_per_stratum must be positive: $capPerStratum")
  require(dsirTopK.forall(_ > 0), s"dsir_top_k must be positive: $dsirTopK")
  require(dsirTopK.isEmpty == dsirTargetValue.isEmpty,
    "dsir_top_k and dsir_target_value come together")
  require(sampleK.forall(_ > 0), s"sample_k must be positive: $sampleK")
  require(dsirTopK.isEmpty || sampleK.isEmpty,
    "dsir_top_k and sample_k are mutually exclusive selection stages")

  def strata: Option[(String, Map[String, Int], Int)] =
    strataCol.map(c => (c, strataRates, strataDefaultPct))
}

object TrainingSetConfig {
  private val mapper = new ObjectMapper()

  /** Parse the job's JSON shape; absent fields keep operator defaults. */
  def parse(json: String): TrainingSetConfig = {
    val n = mapper.readTree(json)
    def optNode(f: String): Option[JsonNode] =
      Option(n.get(f)).filterNot(_.isNull)
    def text(f: String, d: String) = optNode(f).map(_.asText).getOrElse(d)
    def long(f: String, d: Long) = optNode(f).map(_.asLong).getOrElse(d)
    def int(f: String, d: Int) = optNode(f).map(_.asInt).getOrElse(d)
    def dbl(f: String, d: Double) = optNode(f).map(_.asDouble).getOrElse(d)
    def bool(f: String, d: Boolean) = optNode(f).map(_.asBoolean).getOrElse(d)
    TrainingSetConfig(
      stripMarkup = bool("strip_markup", d = false),
      normalize = bool("normalize", d = false),
      lang = text("lang", "en"),
      minTokens = long("min_tokens", 10),
      maxDigitRatio = dbl("max_digit_ratio", 0.3),
      ngram = int("ngram", 3),
      minJaccard = dbl("min_jaccard", 0.5),
      maxDf = optNode("max_df").map(_.asLong),
      softDedup = bool("soft_dedup", d = false),
      evalDir = optNode("eval_dir").map(_.asText),
      evalMinOverlap = long("eval_min_overlap", 5),
      redact = bool("redact", d = false),
      strataCol = optNode("strata_col").map(_.asText),
      strataRates = optNode("strata_rates").map(r =>
        r.properties.asScala.map(e => e.getKey -> e.getValue.asInt).toMap)
        .getOrElse(Map.empty),
      strataDefaultPct = int("strata_default_pct", 100),
      capPerStratum = optNode("cap_per_stratum").map(_.asInt),
      capStrataCol = text("cap_strata_col", "source"),
      c4Clean = bool("c4_clean", d = false),
      gopherGate = bool("gopher_gate", d = false),
      lmRefDropQ = optNode("lm_ref_drop_q").map(_.asDouble),
      lmRefDir = optNode("lm_ref_dir").map(_.asText),
      lmRefLambda = dbl("lm_ref_lambda", 0.9),
      lmRefMinBigram = optNode("lm_ref_min_bigram").map(_.asLong),
      lmRefStrataCol = optNode("lm_ref_strata_col").map(_.asText),
      substrWindow = optNode("substr_window").map(_.asInt),
      mixWeights = optNode("mix_weights").map(r =>
        r.properties.asScala.map(e => e.getKey -> e.getValue.asDouble).toMap)
        .getOrElse(Map.empty),
      mixAlpha = optNode("mix_alpha").map(_.asDouble),
      mixBudget = dbl("mix_budget", 0.0),
      mixStrataCol = text("mix_strata_col", "source"),
      mixRepeats = bool("mix_repeats", d = false),
      dsirTopK = optNode("dsir_top_k").map(_.asInt),
      dsirTargetCol = text("dsir_target_col", "source"),
      dsirTargetValue = optNode("dsir_target_value").map(_.asText),
      sampleK = optNode("sample_k").map(_.asInt),
      sampleWeightCol = text("sample_weight_col", "n_chars"),
      chunkBudget = int("chunk_budget", 512),
      chunkStride = optNode("chunk_stride").map(_.asInt),
      chunkSentences = bool("chunk_sentences", d = false),
      bpeMergesPath = optNode("bpe_merges_path").map(_.asText),
      bpeTrainMerges = optNode("bpe_train_merges").map(_.asInt),
      emitIds = bool("emit_ids", d = false),
      emitBoundaries = bool("emit_boundaries", d = false),
      packGroups = int("pack_groups", 32),
      nShards = int("n_shards", 64),
      compactEvery = optNode("compact_every").map(_.asInt),
      checkpointDir = optNode("checkpoint_dir").map(_.asText))
  }
}
