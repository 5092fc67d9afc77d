package graft

import graft.core.Fuser.TimestampCol
import graft.ops.Resampler
import graft.ops.Resampler.ResampleOptions
import graft.sources.FrameSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: fuse two heterogeneous event
    * sub-streams into one chronological stream, resample to a 1h grid with
    * gap fill + forward-filled value (the reference's core end-to-end path:
    * M1-M4 + A1-A5 + W3).
    */
  def entry(spark: SparkSession): DataFrame =
    // same fuse as the oracle-verified q_fuse_merge, resampled to 1h
    Resampler.resample(Queries.fuseMerge(spark, "/root/testdata/sf0.001"), "1h",
      opts = ResampleOptions(ffillKeys = Seq("value"), tieCols = Seq("event_id")))

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // fusion / reference surface
    "q_fuse_merge"       -> (Queries.fuseMerge _),
    "q_fuse_rename"      -> (Queries.fuseRename _),
    "q_time_filter"      -> (Queries.timeFilter _),
    "q_ts_convert"       -> (Queries.tsConvert _),
    "q_minmax_ts"        -> (Queries.minmaxTs _),
    "q_resample_1h"      -> ((s: SparkSession, d: String) => Queries.resample(s, d, "1h")),
    "q_resample_1d"      -> ((s: SparkSession, d: String) => Queries.resample(s, d, "1d")),
    "q_resample_keyed"   -> (Queries.resampleKeyed _),
    "q_resample_window"  -> (Queries.resampleWindow _),
    "q_ffill"            -> (Queries.ffill _),
    // dedup
    "q_dedup_exact"      -> (Queries.dedupExact _),
    "q_dedup_jaccard"    -> (Queries.dedupJaccard _),
    "q_dup_matrix"       -> (Queries.dupMatrix _),
    "q_dedup_minhash"    -> (Queries.dedupMinhash _),
    "q_simhash"          -> (Queries.simhash _),
    "q_simhash_neardup"  -> (Queries.simhashNearDup _),
    "q_dedup_clusters"   -> (Queries.dedupClusters _),
    "q_dedup_keep"       -> (Queries.dedupKeep _),
    "q_curate"           -> (Queries.curate _),
    // text analysis
    "q_text_quality"     -> (Queries.textQuality _),
    "q_lang_id"          -> (Queries.langId _),
    "q_token_stats"      -> (Queries.tokenStats _),
    "q_token_bpe"        -> (Queries.tokenBpe _),
    "q_fingerprint"      -> (Queries.fingerprint _),
    "q_fingerprint_rolling" -> (Queries.fingerprintRolling _),
    "q_scrub"            -> (Queries.scrub _),
    "q_normalize"        -> (Queries.normalize _),
    "q_ngram_freq"       -> (Queries.ngramFreq _),
    "q_sample_stratified" -> (Queries.sampleStratified _),
    "q_pack_budget"      -> (Queries.packBudget _),
    "q_chunk"            -> (Queries.chunk _),
    "q_contamination"    -> (Queries.contamination _),
    "q_repetition"       -> (Queries.repetition _),
    "q_weighted_sample"  -> (Queries.weightedSample _),
    "q_mix_sources"      -> (Queries.mixSources _),
    // similarity
    "q_ann_topk"         -> (Queries.annTopK _),
    "q_ann_threshold"    -> (Queries.annThreshold _),
    "q_ann_lsh"          -> (Queries.annLsh _),
    "q_ivf_centroids"    -> (Queries.ivfCentroids _),
    "q_ivf_cells"        -> (Queries.ivfCells _),
    "q_ann_ivf"          -> (Queries.annIvf _),
    "q_ann_ivf_probe"    -> (Queries.annIvfProbe _),
    "q_pq_codebooks"     -> (Queries.pqCodebooks _),
    "q_pq_codes"         -> (Queries.pqCodes _),
    "q_ann_pq"           -> (Queries.annPq _),
    "q_ann_ivfpq"        -> (Queries.annIvfPq _),
    // multimodal
    "q_multimodal_meta"  -> (Queries.multimodalMeta _),
    "q_multimodal_feats" -> (Queries.multimodalFeatures _),
    "q_audio_decode"     -> (Queries.audioDecode _),
    // relational / temporal joins (beyond-reference capabilities)
    "q_asof_join"        -> (Queries.asofJoin _),
    "q_asof_forward"     -> (Queries.asofForward _),
    "q_asof_nearest"     -> (Queries.asofNearest _),
    "q_salted_join"      -> (Queries.saltedJoinQ _),
    "q_range_join"       -> (Queries.rangeJoin _),
    "q_sessionize"       -> (Queries.sessionize _),
    "q_rolling_mean"     -> (Queries.rollingMean _),
    "q_rolling_corr"     -> (Queries.rollingCorr _),
    "q_rolling_slope"    -> (Queries.rollingSlope _),
    "q_sliding_agg"      -> (Queries.slidingAgg _),
    "q_interp_grid"      -> (Queries.interpGrid _),
    "q_ohlc"             -> (Queries.ohlc _),
    "q_twap"             -> (Queries.twap _),
    "q_gaps"             -> (Queries.gapReport _),
    "q_outliers"         -> (Queries.outliers _),
    "q_zorder"           -> (Queries.zorder _),
    "q_zorder3"          -> (Queries.zorder3 _),
    "q_cube"             -> (Queries.cubeTypes _),
    "q_debounce"         -> (Queries.debounceQ _),
    "q_ewma"             -> (Queries.ewmaQ _),
    "q_autocorr"         -> (Queries.autocorr _),
    "q_trend"            -> (Queries.trend _),
    "q_domain_quota"     -> (Queries.domainQuota _),
    "q_url_extract"      -> (Queries.urlExtract _),
    "q_topk_per_key"     -> (Queries.topkPerKey _),
    "q_pivot_types"      -> (Queries.pivotTypes _),
    "q_histogram"        -> (Queries.histogram _),
    "q_approx_intersect" -> (Queries.approxIntersect _),
    "q_gif_frames"       -> (Queries.gifFrames _),
    "q_percentiles"      -> (Queries.percentiles _),
    "q1_agg"             -> (Queries.q1Agg _),
    "q_rollup"           -> (Queries.rollup _),
    "q_distinct"         -> (Queries.distinctCounts _),
    "q_join_enrich"      -> (Queries.joinEnrich _),
    // sketches (approximate profiling with exact certificates)
    "q_approx_distinct"  -> (Queries.approxDistinct _),
    "q_sketch_union"     -> (Queries.sketchUnion _),
    "q_bloom_probe"      -> (Queries.bloomProbe _),
    "q_tfidf"            -> (Queries.tfidf _),
    "q_unigram_score"    -> (Queries.unigram _),
    "q_layout_window"    -> (Queries.layoutWindow _),
    "q_dedup_incremental" -> (Queries.dedupIncremental _),
    "q_dedup_incr_near"  -> (Queries.dedupIncrNear _),
    "q_dup_ngram_frac"   -> (Queries.dupNgramFrac _),
    "q_json_extract"     -> (Queries.jsonExtract _),
    "q_quality_filter"   -> (Queries.qualityFilter _),
    "q_heavy_hitters"    -> (Queries.heavyHitters _),
    "q_approx_percentiles" -> (Queries.approxPercentiles _)
  )

  /** DuckDB oracle SQL per query (same column names + ORDER BY as the Spark
    * side). As of round 5 EVERY query has an oracle — `q_ivf_centroids`
    * (the trained k-means artifact) carries an invariant oracle over its
    * own dump rather than a re-derivation, and everything derived from it
    * is fully re-derived ([[Queries.ivfCentroidsSql]]).
    *
    * `__VERIFY_OUT__` inside a SQL string is replaced by [[Verify]] with
    * the dump directory, letting an oracle re-derive a query from another
    * query's exported parquet (IVF cells from centroids, top-k from cells).
    */
  def oracleSql: Map[String, String] = Map(
    "q_fuse_merge"      -> Queries.fuseMergeSql,
    "q_fuse_rename"     -> Queries.fuseRenameSql,
    "q_time_filter"     -> Queries.timeFilterSql,
    "q_ts_convert"      -> Queries.tsConvertSql,
    "q_minmax_ts"       -> Queries.minmaxTsSql,
    "q_resample_1h"     -> Queries.resampleSql(3600000L),
    "q_resample_1d"     -> Queries.resampleSql(86400000L),
    "q_resample_keyed"  -> Queries.resampleKeyedSql,
    "q_resample_window" -> Queries.resampleWindowSql,
    "q_ffill"           -> Queries.ffillSql,
    "q_dedup_exact"     -> Queries.dedupExactSql,
    "q_dedup_jaccard"   -> Queries.dedupJaccardSql,
    "q_dup_matrix"      -> Queries.dupMatrixSql,
    "q_text_quality"    -> Queries.textQualitySql,
    "q_lang_id"         -> Queries.langIdSql,
    "q_token_stats"     -> Queries.tokenStatsSql,
    "q_token_bpe"       -> Queries.tokenBpeSql,
    "q_fingerprint"     -> Queries.fingerprintSql,
    "q_fingerprint_rolling" -> Queries.fingerprintRollingSql,
    "q_scrub"           -> Queries.scrubSql,
    "q_normalize"       -> Queries.normalizeSql,
    "q_ngram_freq"      -> Queries.ngramFreqSql,
    "q_sample_stratified" -> Queries.sampleStratifiedSql,
    "q_pack_budget"     -> Queries.packBudgetSql,
    "q_chunk"           -> Queries.chunkSql,
    "q_contamination"   -> Queries.contaminationSql,
    "q_repetition"      -> Queries.repetitionSql,
    "q_weighted_sample" -> Queries.weightedSampleSql,
    "q_mix_sources"     -> Queries.mixSourcesSql,
    "q_ann_topk"        -> Queries.annTopKSql,
    "q_ann_threshold"   -> Queries.annThresholdSql,
    "q_ann_lsh"         -> Queries.annLshSql,
    "q_ivf_centroids"   -> Queries.ivfCentroidsSql,
    "q_ivf_cells"       -> Queries.ivfCellsSql,
    "q_ann_ivf"         -> Queries.annIvfSql,
    "q_ann_ivf_probe"   -> Queries.annIvfProbeSql,
    "q_pq_codebooks"    -> Queries.pqCodebooksSql,
    "q_pq_codes"        -> Queries.pqCodesSql,
    "q_ann_pq"          -> Queries.annPqSql,
    "q_ann_ivfpq"       -> Queries.annIvfPqSql,
    "q_dedup_minhash"   -> Queries.dedupMinhashSql,
    "q_simhash"         -> Queries.simhashSql,
    "q_simhash_neardup" -> Queries.simhashNearDupSql,
    "q_dedup_clusters"  -> Queries.dedupClustersSql,
    "q_dedup_keep"      -> Queries.dedupKeepSql,
    "q_curate"          -> Queries.curateSql,
    "q_multimodal_meta" -> Queries.multimodalMetaSql,
    "q_multimodal_feats" -> Queries.multimodalFeaturesSql,
    "q_audio_decode"    -> Queries.audioDecodeSql,
    "q_asof_join"       -> Queries.asofJoinSql,
    "q_asof_forward"    -> Queries.asofForwardSql,
    "q_asof_nearest"    -> Queries.asofNearestSql,
    "q_salted_join"     -> Queries.saltedJoinSql,
    "q_range_join"      -> Queries.rangeJoinSql,
    "q_sessionize"      -> Queries.sessionizeSql,
    "q_rolling_mean"    -> Queries.rollingMeanSql,
    "q_rolling_corr"    -> Queries.rollingCorrSql,
    "q_rolling_slope"   -> Queries.rollingSlopeSql,
    "q_sliding_agg"     -> Queries.slidingAggSql,
    "q_interp_grid"     -> Queries.interpGridSql,
    "q_ohlc"            -> Queries.ohlcSql,
    "q_twap"            -> Queries.twapSql,
    "q_gaps"            -> Queries.gapReportSql,
    "q_outliers"        -> Queries.outliersSql,
    "q_zorder"          -> Queries.zorderSql,
    "q_zorder3"         -> Queries.zorder3Sql,
    "q_cube"            -> Queries.cubeTypesSql,
    "q_debounce"        -> Queries.debounceSql,
    "q_ewma"            -> Queries.ewmaSql,
    "q_autocorr"        -> Queries.autocorrSql,
    "q_trend"           -> Queries.trendSql,
    "q_domain_quota"    -> Queries.domainQuotaSql,
    "q_url_extract"     -> Queries.urlExtractSql,
    "q_topk_per_key"    -> Queries.topkPerKeySql,
    "q_pivot_types"     -> Queries.pivotTypesSql,
    "q_histogram"       -> Queries.histogramSql,
    "q_approx_intersect" -> Queries.approxIntersectSql,
    "q_gif_frames"      -> Queries.gifFramesSql,
    "q_percentiles"     -> Queries.percentilesSql,
    "q1_agg"            -> Queries.q1AggSql,
    "q_rollup"          -> Queries.rollupSql,
    "q_distinct"        -> Queries.distinctCountsSql,
    "q_join_enrich"     -> Queries.joinEnrichSql,
    "q_approx_distinct" -> Queries.approxDistinctSql,
    "q_sketch_union"    -> Queries.sketchUnionSql,
    "q_bloom_probe"     -> Queries.bloomProbeSql,
    "q_tfidf"           -> Queries.tfidfSql,
    "q_unigram_score"   -> Queries.unigramSql,
    "q_layout_window"   -> Queries.layoutWindowSql,
    "q_dedup_incremental" -> Queries.dedupIncrementalSql,
    "q_dedup_incr_near" -> Queries.dedupIncrNearSql,
    "q_dup_ngram_frac"  -> Queries.dupNgramFracSql,
    "q_json_extract"    -> Queries.jsonExtractSql,
    "q_quality_filter"  -> Queries.qualityFilterSql,
    "q_heavy_hitters"   -> Queries.heavyHittersSql,
    "q_approx_percentiles" -> Queries.approxPercentilesSql
  )
}
