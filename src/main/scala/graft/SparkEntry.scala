package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * 100TB-pipeline extension operator); entries with a key in [[oracleSql]]
  * are hash-checked against DuckDB on the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full synth-log → parse → sessionize → events pipeline. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.e2e(spark, "/root/testdata/sf0.001")

  /** The HEADLINE set: [[queries]] minus the `*_violations` /
    * `*_recall` / `*_planted` diagnostics (correctness proofs for the
    * operators the other rows already time — benching them would
    * double-count identical work; see `Bench`'s scaladoc). The ONE
    * definition both `graft.Bench` (timing) and `tools.Explain`
    * (PLANS.md) consume, so the two can't drift and the round-close
    * rule "PLANS.md section count == headline count" holds by
    * construction. */
  def headlineQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    queries.toSeq.sortBy(_._1).filterNot { case (n, _) =>
      n.endsWith("_violations") || n.endsWith("_recall") ||
        n.endsWith("_planted")
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- log pipeline (SURVEY §2.2-2.4: P1-P11, T1-T3, A1-A6, E2, S1) --
    "pipeline_e2e" -> (PipelineQueries.e2e _),
    "pipeline_subject_mime" -> (PipelineQueries.subjectMime _),
    "pipeline_subject_ascii" -> (PipelineQueries.subjectAscii _),
    "pipeline_dovecot_join" -> (PipelineQueries.dovecotJoin _),
    "pipeline_faults" -> (PipelineQueries.faults _),
    // -- implied ClickHouse-side surface (SURVEY §2.5) --
    "events_time_range" -> (AnalyticsQueries.eventsTimeRange _),
    "events_json_props" -> (AnalyticsQueries.eventsJsonProps _),
    "events_sessionize_gap" -> (AnalyticsQueries.eventsSessionize _),
    "events_asof_purchase" -> (AnalyticsQueries.eventsAsofPurchase _),
    "salted_user_types" -> (AnalyticsQueries.saltedUserTypes _),
    "salted_value_median" -> (AnalyticsQueries.saltedValueMedian _),
    "salted_value_median_weighted" -> (AnalyticsQueries.saltedValueMedianWeighted _),
    "salted_value_quartiles" -> (AnalyticsQueries.saltedValueQuartiles _),
    "events_asof_purchase_tol" -> (AnalyticsQueries.eventsAsofPurchaseTol _),
    "events_argmax" -> (AnalyticsQueries.eventsArgMax _),
    "sql_array_hof" -> (AnalyticsQueries.sqlArrayHof _),
    "events_value_histogram" -> (AnalyticsQueries.eventsValueHistogram _),
    "salted_order_lines" -> (AnalyticsQueries.saltedOrderLines _),
    "events_window_count" -> (AnalyticsQueries.eventsWindowCount _),
    "events_funnel" -> (AnalyticsQueries.eventsFunnel _),
    "events_retention" -> (AnalyticsQueries.eventsRetention _),
    "events_retention_cum" -> (AnalyticsQueries.eventsRetentionCum _),
    "events_sequence_match" -> (AnalyticsQueries.eventsSequenceMatch _),
    "events_sequence_match_timed" -> (AnalyticsQueries.eventsSequenceMatchTimed _),
    "events_sequence_count" -> (AnalyticsQueries.eventsSequenceCount _),
    "top_words" -> (AnalyticsQueries.topWords _),
    // -- core analytics operators (SURVEY §2.6 "free from Catalyst") --
    "q1_pricing" -> (AnalyticsQueries.q1Pricing _),
    "q3_shipping" -> (AnalyticsQueries.q3Shipping _),
    "q5_local_supplier" -> (AnalyticsQueries.q5LocalSupplier _),
    "window_top_orders" -> (AnalyticsQueries.windowTopOrders _),
    "rollup_returns" -> (AnalyticsQueries.rollupReturns _),
    "setops_customers" -> (AnalyticsQueries.setOpsCustomers _),
    "part_brand_stats" -> (AnalyticsQueries.partBrandStats _),
    "subquery_not_exists" -> (AnalyticsQueries.notExistsRecentOrders _),
    "subquery_scalar_avg" -> (AnalyticsQueries.scalarSubqueryAboveAvg _),
    "profile_lineitem" -> (AnalyticsQueries.profileLineitem _),
    "profile_sketch_violations" -> (AnalyticsQueries.profileSketchViolations _),
    // -- mergeable HLL sketch cube (approx; exact twin + violations gate) --
    "events_distinct_hll" -> (AnalyticsQueries.eventsDistinctHll _),
    "events_distinct_exact" -> (AnalyticsQueries.eventsDistinctExact _),
    "events_distinct_hll_violations" ->
      (AnalyticsQueries.eventsDistinctHllViolations _),
    "events_audience_theta" -> (AnalyticsQueries.eventsAudienceTheta _),
    "events_audience_exact" -> (AnalyticsQueries.eventsAudienceExact _),
    "events_audience_theta_violations" ->
      (AnalyticsQueries.eventsAudienceThetaViolations _),
    "events_value_kll" -> (AnalyticsQueries.eventsValueKll _),
    "events_value_kll_violations" ->
      (AnalyticsQueries.eventsValueKllViolations _),
    // -- 100TB training-data pipeline extension operators --
    "dedup_exact" -> (ExtensionQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (ExtensionQueries.dedupNgramJaccard _),
    "dedup_components" -> (ExtensionQueries.dedupComponents _),
    "dedup_keep_best" -> (ExtensionQueries.dedupKeepBest _),
    "dedup_minhash_lsh" -> (ExtensionQueries.dedupMinhashLsh _),
    "dedup_simhash" -> (ExtensionQueries.dedupSimhash _),
    "dedup_embedding_cosine" -> (ExtensionQueries.dedupEmbeddingCosine _),
    "dedup_embedding_exact" -> (ExtensionQueries.dedupEmbeddingExact _),
    "dedup_embedding_twins" -> (ExtensionQueries.dedupEmbeddingTwins _),
    "ann_cosine_topk" -> (ExtensionQueries.annCosineTopK _),
    "embedding_quantize" -> (ExtensionQueries.embeddingQuantize _),
    "ann_lsh_topk" -> (ExtensionQueries.annLshTopK _),
    "ann_ivf_topk" -> (ExtensionQueries.annIvfTopK _),
    "ann_ivfq_topk" -> (ExtensionQueries.annIvfqTopK _),
    "ann_pq_topk" -> (ExtensionQueries.annPqTopK _),
    "text_stats" -> (ExtensionQueries.textStats _),
    "text_langid" -> (ExtensionQueries.textLangId _),
    "text_token_count" -> (ExtensionQueries.textTokenCount _),
    "text_fingerprint" -> (ExtensionQueries.textFingerprint _),
    "text_repetition" -> (ExtensionQueries.textRepetition _),
    "text_pii_redact" -> (ExtensionQueries.textPiiRedact _),
    "text_winnow_fingerprint" -> (ExtensionQueries.textWinnow _),
    "text_bm25_search" -> (ExtensionQueries.textBm25 _),
    "text_keywords" -> (ExtensionQueries.textKeywords _),
    "text_lm_likelihood" -> (ExtensionQueries.textLmLikelihood _),
    "text_lm_heldout" -> (ExtensionQueries.textLmHeldout _),
    "text_nb_classify" -> (ExtensionQueries.textNbClassify _),
    "text_nb_confusion" -> (ExtensionQueries.textNbConfusion _),
    "text_heavy_hitters" -> (ExtensionQueries.textHeavyHitters _),
    "corpus_heavy_sources" -> (ExtensionQueries.corpusHeavySources _),
    "text_bpe_tokens" -> (ExtensionQueries.textBpeTokens _),
    "text_bpe_violations" -> (ExtensionQueries.textBpeViolations _),
    "corpus_split" -> (ExtensionQueries.corpusSplit _),
    "corpus_pack_sequences" -> (ExtensionQueries.corpusPackSequences _),
    "corpus_chunk_overlap" -> (ExtensionQueries.corpusChunkOverlap _),
    "corpus_pack_bins" -> (ExtensionQueries.corpusPackBins _),
    "corpus_pack_bins_violations" -> (ExtensionQueries.corpusPackBinsViolations _),
    "corpus_decontaminate" -> (ExtensionQueries.corpusDecontaminate _),
    "corpus_source_profile" -> (ExtensionQueries.corpusSourceProfile _),
    "corpus_decontaminate_semantic" -> (ExtensionQueries.corpusDecontaminateSemantic _),
    "corpus_domain_cap" -> (ExtensionQueries.corpusDomainCap _),
    "corpus_sample_weighted" -> (ExtensionQueries.corpusSampleWeighted _),
    "corpus_upsample" -> (ExtensionQueries.corpusUpsample _),
    "corpus_shuffle" -> (ExtensionQueries.corpusShuffle _),
    "text_freq_quality" -> (ExtensionQueries.textFreqQuality _),
    "corpus_mixture" -> (ExtensionQueries.corpusMixture _),
    "corpus_take_uniform" -> (ExtensionQueries.corpusTakeUniform _),
    "dedup_semantic" -> (ExtensionQueries.dedupSemantic _),
    "corpus_span_dedup" -> (ExtensionQueries.corpusSpanDedup _),
    "dedup_substring" -> (ExtensionQueries.dedupSubstring _),
    "corpus_strip_substrings" -> (ExtensionQueries.corpusStripSubstrings _),
    "dedup_substring_incremental" -> (ExtensionQueries.dedupSubstringIncremental _),
    "dedup_containment" -> (ExtensionQueries.dedupContainment _),
    "corpus_dup_profile" -> (ExtensionQueries.corpusDupProfile _),
    "search_hybrid_rrf" -> (ExtensionQueries.searchHybridRrf _),
    "dedup_incremental" -> (ExtensionQueries.dedupIncremental _),
    "dedup_incremental_exact" -> (ExtensionQueries.dedupIncrementalExact _),
    "dedup_incremental_violations" -> (ExtensionQueries.dedupIncrementalViolations _),
    // -- violation queries: hash-green emptiness proofs for the LSH family.
    //    Each recomputes the operator's exact-verify contract through an
    //    independent path; the oracle is the guaranteed constant (0
    //    violations, liveness flag 1). --
    "dedup_semantic_violations" -> (ExtensionQueries.dedupSemanticViolations _),
    "dedup_minhash_violations" -> (ExtensionQueries.dedupMinhashViolations _),
    "dedup_simhash_violations" -> (ExtensionQueries.dedupSimhashViolations _),
    "dedup_embedding_violations" -> (ExtensionQueries.dedupEmbeddingViolations _),
    "ann_lsh_violations" -> (ExtensionQueries.annLshViolations _),
    "ann_ivf_violations" -> (ExtensionQueries.annIvfViolations _),
    "ann_ivfq_violations" -> (ExtensionQueries.annIvfqViolations _),
    "ann_pq_violations" -> (ExtensionQueries.annPqViolations _),
    // -- recall gates: the violations rows prove precision; these prove
    //    the approximate indexes RETRIEVE (mean recall@k >= 0.9 vs the
    //    oracle-green exact frame), reduced to a constant provable row --
    "ann_lsh_recall" -> (ExtensionQueries.annLshRecall _),
    "ann_ivf_recall" -> (ExtensionQueries.annIvfRecall _),
    "ann_ivfq_recall" -> (ExtensionQueries.annIvfqRecall _),
    "ann_pq_recall" -> (ExtensionQueries.annPqRecall _),
    "dedup_minhash_recall" -> (ExtensionQueries.dedupMinhashRecall _),
    "dedup_embedding_recall" -> (ExtensionQueries.dedupEmbeddingRecall _),
    "text_winnow_violations" -> (ExtensionQueries.textWinnowViolations _),
    "corpus_clean" -> (ExtensionQueries.corpusClean _),
    "corpus_curate" -> (ExtensionQueries.corpusCurate _),
    "corpus_curate_summary" -> (ExtensionQueries.corpusCurateSummary _),
    "corpus_curate_substring" -> (ExtensionQueries.corpusCurateSubstring _),
    "corpus_curate_substring_planted" ->
      (ExtensionQueries.corpusCurateSubstringPlanted _),
    "multimodal_features" -> (ExtensionQueries.multimodalFeatures _),
    "multimodal_resize" -> (ExtensionQueries.multimodalResize _),
    "multimodal_frames" -> (ExtensionQueries.multimodalFrames _),
    "multimodal_media_meta" -> (ExtensionQueries.multimodalMediaMeta _),
    "multimodal_audio_stats" -> (ExtensionQueries.multimodalAudioStats _),
    "multimodal_ulaw_stats" -> (ExtensionQueries.multimodalUlawStats _),
    "multimodal_adpcm_stats" -> (ExtensionQueries.multimodalAdpcmStats _),
    "multimodal_mjpeg_frames" -> (ExtensionQueries.multimodalMjpegFrames _),
    "multimodal_mjpeg_decode_violations" ->
      (ExtensionQueries.multimodalMjpegDecodeViolations _),
    "multimodal_mp3_meta" -> (ExtensionQueries.multimodalMp3Meta _),
    "multimodal_flac_meta" -> (ExtensionQueries.multimodalFlacMeta _),
    "multimodal_aiff_meta" -> (ExtensionQueries.multimodalAiffMeta _),
    "multimodal_image_dhash" -> (ExtensionQueries.multimodalImageDhash _),
    "text_html_extract" -> (ExtensionQueries.textHtmlExtract _),
    "dedup_image_phash" -> (ExtensionQueries.dedupImagePhash _),
    "dedup_image_phash_violations" ->
      (ExtensionQueries.dedupImagePhashViolations _),
    "dedup_image_phash_recall" -> (ExtensionQueries.dedupImagePhashRecall _),
    "multimodal_audio_envhash" -> (ExtensionQueries.multimodalAudioEnvhash _),
    "dedup_audio_env" -> (ExtensionQueries.dedupAudioEnv _),
    "dedup_audio_env_violations" ->
      (ExtensionQueries.dedupAudioEnvViolations _),
    "dedup_audio_env_recall" -> (ExtensionQueries.dedupAudioEnvRecall _),
    "multimodal_aiff_stats" -> (ExtensionQueries.multimodalAiffStats _),
    "multimodal_video_sig" -> (ExtensionQueries.multimodalVideoSig _),
    "dedup_video_sig" -> (ExtensionQueries.dedupVideoSig _),
    "dedup_video_sig_violations" ->
      (ExtensionQueries.dedupVideoSigViolations _),
    "dedup_video_sig_recall" -> (ExtensionQueries.dedupVideoSigRecall _),
    "dedup_video_containment" -> (ExtensionQueries.dedupVideoContainment _),
    "events_session_window" -> (AnalyticsQueries.eventsSessionWindow _),
    // -- spark.sql surface over registered views + custom SQL functions --
    "sql_events_arrayjoin" -> (PipelineQueries.sqlArrayJoin _),
    "sql_mime_decode" -> (ExtensionQueries.sqlMimeDecode _)
  )

  def oracleSql: Map[String, String] = Map(
    "pipeline_e2e" -> PipelineQueries.e2eOracle,
    "pipeline_subject_mime" -> PipelineQueries.subjectMimeOracle,
    "pipeline_subject_ascii" -> PipelineQueries.subjectAsciiOracle,
    "pipeline_dovecot_join" -> PipelineQueries.dovecotOracle,
    "pipeline_faults" -> PipelineQueries.faultsOracle,
    "events_time_range" -> AnalyticsQueries.eventsTimeRangeOracle,
    "events_json_props" -> AnalyticsQueries.eventsJsonPropsOracle,
    "events_sessionize_gap" -> AnalyticsQueries.eventsSessionizeOracle,
    "events_asof_purchase" -> AnalyticsQueries.eventsAsofPurchaseOracle,
    "salted_user_types" -> AnalyticsQueries.saltedUserTypesOracle,
    "salted_value_median" -> AnalyticsQueries.saltedValueMedianOracle,
    "salted_value_median_weighted" -> AnalyticsQueries.saltedValueMedianWeightedOracle,
    "salted_value_quartiles" -> AnalyticsQueries.saltedValueQuartilesOracle,
    "events_asof_purchase_tol" -> AnalyticsQueries.eventsAsofPurchaseTolOracle,
    "events_argmax" -> AnalyticsQueries.eventsArgMaxOracle,
    "sql_array_hof" -> AnalyticsQueries.sqlArrayHofOracle,
    "events_value_histogram" -> AnalyticsQueries.eventsValueHistogramOracle,
    "salted_order_lines" -> AnalyticsQueries.saltedOrderLinesOracle,
    "events_window_count" -> AnalyticsQueries.eventsWindowCountOracle,
    "events_funnel" -> AnalyticsQueries.eventsFunnelOracle,
    "events_retention" -> AnalyticsQueries.eventsRetentionOracle,
    "events_retention_cum" -> AnalyticsQueries.eventsRetentionCumOracle,
    "events_sequence_match" -> AnalyticsQueries.eventsSequenceMatchOracle,
    "events_sequence_match_timed" -> AnalyticsQueries.eventsSequenceMatchTimedOracle,
    "events_sequence_count" -> AnalyticsQueries.eventsSequenceCountOracle,
    "top_words" -> AnalyticsQueries.topWordsOracle,
    "q1_pricing" -> AnalyticsQueries.q1PricingOracle,
    "q3_shipping" -> AnalyticsQueries.q3ShippingOracle,
    "q5_local_supplier" -> AnalyticsQueries.q5LocalSupplierOracle,
    "window_top_orders" -> AnalyticsQueries.windowTopOrdersOracle,
    "rollup_returns" -> AnalyticsQueries.rollupReturnsOracle,
    "setops_customers" -> AnalyticsQueries.setOpsCustomersOracle,
    "part_brand_stats" -> AnalyticsQueries.partBrandStatsOracle,
    "subquery_not_exists" -> AnalyticsQueries.notExistsRecentOrdersOracle,
    "subquery_scalar_avg" -> AnalyticsQueries.scalarSubqueryAboveAvgOracle,
    "profile_lineitem" -> AnalyticsQueries.profileLineitemOracle,
    "profile_sketch_violations" -> ExtensionQueries.violationOracle,
    "events_distinct_exact" -> AnalyticsQueries.eventsDistinctExactOracle,
    "events_distinct_hll_violations" -> ExtensionQueries.violationOracle,
    "events_audience_exact" -> AnalyticsQueries.eventsAudienceExactOracle,
    "events_audience_theta_violations" -> ExtensionQueries.violationOracle,
    "events_value_kll_violations" -> ExtensionQueries.violationOracle,
    "text_repetition" -> ExtensionQueries.textRepetitionOracle,
    "text_pii_redact" -> ExtensionQueries.textPiiRedactOracle,
    "corpus_clean" -> ExtensionQueries.corpusCleanOracle,
    "corpus_curate" -> ExtensionQueries.corpusCurateOracle,
    "corpus_curate_summary" -> ExtensionQueries.corpusCurateSummaryOracle,
    "corpus_curate_substring" -> ExtensionQueries.corpusCurateSubstringOracle,
    "corpus_curate_substring_planted" ->
      ExtensionQueries.corpusCurateSubstringPlantedOracle,
    "dedup_exact" -> ExtensionQueries.dedupExactOracle,
    "dedup_ngram_jaccard" -> ExtensionQueries.dedupNgramJaccardOracle,
    "dedup_components" -> ExtensionQueries.dedupComponentsOracle,
    "dedup_keep_best" -> ExtensionQueries.dedupKeepBestOracle,
    "dedup_embedding_exact" -> ExtensionQueries.dedupEmbeddingExactOracle,
    "dedup_embedding_twins" -> ExtensionQueries.dedupEmbeddingTwinsOracle,
    "ann_cosine_topk" -> ExtensionQueries.annCosineTopKOracle,
    "embedding_quantize" -> ExtensionQueries.embeddingQuantizeOracle,
    "text_stats" -> ExtensionQueries.textStatsOracle,
    "text_langid" -> ExtensionQueries.textLangIdOracle,
    "text_token_count" -> ExtensionQueries.textTokenCountOracle,
    "text_fingerprint" -> ExtensionQueries.textFingerprintOracle,
    "multimodal_features" -> ExtensionQueries.multimodalFeaturesOracle,
    "multimodal_resize" -> ExtensionQueries.multimodalResizeOracle,
    "multimodal_frames" -> ExtensionQueries.multimodalFramesOracle,
    "multimodal_media_meta" -> ExtensionQueries.multimodalMediaMetaOracle,
    "multimodal_audio_stats" -> ExtensionQueries.multimodalAudioStatsOracle,
    "multimodal_ulaw_stats" -> ExtensionQueries.multimodalUlawStatsOracle,
    "multimodal_adpcm_stats" -> ExtensionQueries.multimodalAdpcmStatsOracle,
    "multimodal_mjpeg_frames" -> ExtensionQueries.multimodalMjpegFramesOracle,
    "multimodal_mjpeg_decode_violations" -> ExtensionQueries.violationOracle,
    "multimodal_mp3_meta" -> ExtensionQueries.multimodalMp3MetaOracle,
    "multimodal_flac_meta" -> ExtensionQueries.multimodalFlacMetaOracle,
    "multimodal_aiff_meta" -> ExtensionQueries.multimodalAiffMetaOracle,
    "multimodal_image_dhash" -> ExtensionQueries.multimodalImageDhashOracle,
    "text_html_extract" -> ExtensionQueries.textHtmlExtractOracle,
    "dedup_image_phash" -> ExtensionQueries.dedupImagePhashOracle,
    "dedup_image_phash_violations" -> ExtensionQueries.violationOracle,
    "dedup_image_phash_recall" -> ExtensionQueries.dedupImagePhashRecallOracle,
    "multimodal_audio_envhash" -> ExtensionQueries.multimodalAudioEnvhashOracle,
    "dedup_audio_env" -> ExtensionQueries.dedupAudioEnvOracle,
    "dedup_audio_env_violations" -> ExtensionQueries.violationOracle,
    "dedup_audio_env_recall" -> ExtensionQueries.dedupAudioEnvRecallOracle,
    "multimodal_aiff_stats" -> ExtensionQueries.multimodalAiffStatsOracle,
    "multimodal_video_sig" -> ExtensionQueries.multimodalVideoSigOracle,
    "dedup_video_sig" -> ExtensionQueries.dedupVideoSigOracle,
    "dedup_video_sig_violations" -> ExtensionQueries.violationOracle,
    "dedup_video_sig_recall" -> ExtensionQueries.dedupVideoSigRecallOracle,
    "dedup_video_containment" -> ExtensionQueries.dedupVideoContainmentOracle,
    "events_session_window" -> AnalyticsQueries.eventsSessionWindowOracle,
    "sql_events_arrayjoin" -> PipelineQueries.sqlArrayJoinOracle,
    "sql_mime_decode" -> ExtensionQueries.sqlMimeDecodeOracle,
    "dedup_minhash_violations" -> ExtensionQueries.violationOracle,
    "dedup_simhash_violations" -> ExtensionQueries.violationOracle,
    "dedup_embedding_violations" -> ExtensionQueries.violationOracle,
    "ann_lsh_violations" -> ExtensionQueries.violationOracle,
    "ann_ivf_violations" -> ExtensionQueries.violationOracle,
    "ann_ivfq_violations" -> ExtensionQueries.violationOracle,
    "ann_pq_violations" -> ExtensionQueries.violationOracle,
    "ann_lsh_recall" -> ExtensionQueries.annRecallOracle,
    "ann_ivf_recall" -> ExtensionQueries.annRecallOracle,
    "ann_ivfq_recall" -> ExtensionQueries.annRecallOracle,
    "ann_pq_recall" -> ExtensionQueries.annRecallOracle,
    "dedup_minhash_recall" -> ExtensionQueries.dedupMinhashRecallOracle,
    "dedup_embedding_recall" -> ExtensionQueries.dedupEmbeddingRecallOracle,
    "text_winnow_fingerprint" -> ExtensionQueries.textWinnowOracle,
    "text_winnow_violations" -> ExtensionQueries.textWinnowViolationsOracle,
    "text_bpe_violations" -> ExtensionQueries.violationOracle,
    "text_heavy_hitters" -> ExtensionQueries.textHeavyHittersOracle,
    "corpus_heavy_sources" -> ExtensionQueries.corpusHeavySourcesOracle,
    "text_bm25_search" -> ExtensionQueries.textBm25Oracle,
    "text_keywords" -> ExtensionQueries.textKeywordsOracle,
    "text_lm_likelihood" -> ExtensionQueries.textLmLikelihoodOracle,
    "text_lm_heldout" -> ExtensionQueries.textLmHeldoutOracle,
    "text_nb_classify" -> ExtensionQueries.textNbClassifyOracle,
    "text_nb_confusion" -> ExtensionQueries.textNbConfusionOracle,
    "corpus_split" -> ExtensionQueries.corpusSplitOracle,
    "corpus_pack_sequences" -> ExtensionQueries.corpusPackSequencesOracle,
    "corpus_chunk_overlap" -> ExtensionQueries.corpusChunkOverlapOracle,
    "corpus_pack_bins" -> ExtensionQueries.corpusPackBinsOracle,
    "corpus_pack_bins_violations" -> ExtensionQueries.violationOracle,
    "text_bpe_tokens" -> ExtensionQueries.textBpeTokensOracle,
    "corpus_decontaminate" -> ExtensionQueries.corpusDecontaminateOracle,
    "corpus_source_profile" -> ExtensionQueries.corpusSourceProfileOracle,
    "corpus_decontaminate_semantic" -> ExtensionQueries.corpusDecontaminateSemanticOracle,
    "corpus_domain_cap" -> ExtensionQueries.corpusDomainCapOracle,
    "corpus_sample_weighted" -> ExtensionQueries.corpusSampleWeightedOracle,
    "corpus_upsample" -> ExtensionQueries.corpusUpsampleOracle,
    "corpus_shuffle" -> ExtensionQueries.corpusShuffleOracle,
    "text_freq_quality" -> ExtensionQueries.textFreqQualityOracle,
    "corpus_mixture" -> ExtensionQueries.corpusMixtureOracle,
    "corpus_take_uniform" -> ExtensionQueries.corpusTakeUniformOracle,
    "corpus_span_dedup" -> ExtensionQueries.corpusSpanDedupOracle,
    "dedup_substring" -> ExtensionQueries.dedupSubstringOracle,
    "corpus_strip_substrings" -> ExtensionQueries.corpusStripSubstringsOracle,
    "dedup_substring_incremental" -> ExtensionQueries.dedupSubstringIncrementalOracle,
    "dedup_containment" -> ExtensionQueries.dedupContainmentOracle,
    "corpus_dup_profile" -> ExtensionQueries.corpusDupProfileOracle,
    "search_hybrid_rrf" -> ExtensionQueries.searchHybridRrfOracle,
    "dedup_incremental_exact" -> ExtensionQueries.dedupIncrementalExactOracle,
    "dedup_incremental_violations" -> ExtensionQueries.violationOracle,
    "dedup_semantic_violations" -> ExtensionQueries.violationOracle,
    "dedup_minhash_lsh" -> ExtensionQueries.dedupMinhashLshOracle,
    "dedup_simhash" -> ExtensionQueries.dedupSimhashOracle,
    "ann_lsh_topk" -> ExtensionQueries.annLshTopKOracle,
    "ann_ivf_topk" -> ExtensionQueries.annIvfTopKOracle,
    "ann_ivfq_topk" -> ExtensionQueries.annIvfqTopKOracle,
    "ann_pq_topk" -> ExtensionQueries.annPqTopKOracle,
    "dedup_embedding_cosine" -> ExtensionQueries.dedupEmbeddingCosineOracle,
    "dedup_semantic" -> ExtensionQueries.dedupSemanticOracle,
    "dedup_incremental" -> ExtensionQueries.dedupIncrementalOracle
    // The whole LSH/IVF/cell geometry family is hash-gated via
    // artifact replay (r12): each operator is split into a
    // Spark-kernel geometry stage (signatures, fingerprints, probe
    // frames, cell assignments — persisted per corpus) and a
    // relational stage (banding, span-guarded pairing, candidate
    // joins, exact verify, rerank) that BOTH engines re-derive
    // independently from the persisted frames.
    //
    // The only rows-only entries left are the three DataSketches rows
    // (events_distinct_hll / events_audience_theta / events_value_kll).
    // Their sketch state is an opaque DataSketches binary blob whose
    // estimators are deliberately NOT relational: HLL's HIP estimator
    // is update-history-dependent (merge topology changes the point
    // estimate within the error bound — Sketches.scala accuracy
    // contract), theta intersections estimate through retained-set
    // resampling, and KLL compaction is a randomized multiset. No SQL
    // replay can re-derive the estimate without reimplementing
    // DataSketches inside the oracle, which would test the
    // reimplementation, not the engine. Each row is instead gated by a
    // hash-green exact twin (events_distinct_exact /
    // events_audience_exact) plus a bounded-error *_violations row
    // that prices the published sketch error against the exact answer.
  )
}
