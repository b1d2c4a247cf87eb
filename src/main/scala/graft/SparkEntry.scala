package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Cleanse, Dedup, Egress, Events, ModernSql, Multimodal, Quality, Relational, Sampling, Scale, Similarity, SplitRepair, TextStats, VectorIndex}
import graft.streaming.{StreamDedup, StreamJoin, StreamSessions, StreamSink, StreamingWindows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed here as a
  * (SparkSession, sfDir) => DataFrame, with a DuckDB oracle SQL string
  * over the same parquet tables. Column names and types are aligned
  * between both sides (the driver hash-compares by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join_agg"       -> (Relational.q3JoinAgg _),
    "q4_broadcast_join" -> (Relational.q4BroadcastJoin _),
    "q5_semi_join"      -> (Relational.q5SemiJoin _),
    "q6_anti_join"      -> (Relational.q6AntiJoin _),
    "q7_window_topn"    -> (Relational.q7WindowTopN _),
    "q8_window_running" -> (Relational.q8WindowRunning _),
    "q9_distinct"       -> (Relational.q9Distinct _),
    "q10_count_distinct" -> (Relational.q10CountDistinct _),
    "q11_setops"        -> (Relational.q11SetOps _),
    "q12_sort_limit"    -> (Relational.q12SortLimit _),
    "q13_rollup"        -> (Relational.q13Rollup _),
    "q14_having"        -> (Relational.q14Having _),
    "q15_case_decode"   -> (Relational.q15CaseDecode _),
    "q16_date_agg"      -> (Relational.q16DateAgg _),
    "q17_string_funcs"  -> (Relational.q17StringFuncs _),
    "q18_sql_surface"   -> (Relational.qSqlSurface _),
    "q19_cleanse_country"  -> (Cleanse.qCleanseCountry _),
    "q20_cleanse_pipeline" -> (Cleanse.qCleansePipeline _),
    "q21_cube"             -> (Relational.q21Cube _),
    "q22_approx_distinct"  -> (Relational.q22ApproxDistinct _),
    "q23_top_brand_per_nation" -> (Relational.q23TopBrandPerNation _),
    "q24_dedup_exact"      -> (Dedup.q24DedupExact _),
    "q25_dedup_minhash"    -> (Dedup.q25DedupMinhash _),
    "q26_dedup_simhash"    -> (Dedup.q26DedupSimhash _),
    "q27_cosine_topk"      -> (Similarity.q27CosineTopK _),
    "q28_topk_udaf"        -> (Similarity.q28TopKUdaf _),
    "q29_ann_lsh"          -> (Similarity.q29AnnLsh _),
    "q30_embed_neardup"    -> (Similarity.q30EmbedNearDup _),
    "q31_text_stats"       -> (TextStats.q31TextStats _),
    "q32_lang_id"          -> (TextStats.q32LangId _),
    "q33_quality_score"    -> (TextStats.q33QualityScore _),
    "q34_token_count"      -> (TextStats.q34TokenCount _),
    "q35_doc_fingerprint"  -> (TextStats.q35DocFingerprint _),
    "q36_event_windows"    -> (Events.q36EventWindows _),
    "q37_event_hopping"    -> (Events.q37EventHopping _),
    "q38_sessionize"       -> (Events.q38Sessionize _),
    "q39_stream_windows"   -> (StreamingWindows.q39StreamWindows _),
    "q40_json_props"       -> (Events.q40JsonProps _),
    "q41_csv_roundtrip"    -> (Egress.q41CsvRoundtrip _),
    "q42_catalog_table"    -> (Egress.q42CatalogTable _),
    "q43_multimodal_meta"  -> (Multimodal.q43MultimodalMeta _),
    "q44_media_features"   -> (Multimodal.q44MediaFeatures _),
    "q45_bucketed_join"    -> (Scale.q45BucketedJoin _),
    "q46_partition_pruning" -> (Scale.q46PartitionPruning _),
    "q47_salted_agg"       -> (Scale.q47SaltedAgg _),
    "q48_percentiles"      -> (Relational.q48Percentiles _),
    "q49_pivot"            -> (Relational.q49Pivot _),
    "q50_grouping_sets"    -> (Relational.q50GroupingSets _),
    "q51_asof_join"        -> (AsOf.q51AsofJoin _),
    "q52_range_join"       -> (AsOf.q52RangeJoin _),
    "q53_ann_ivf"          -> (Similarity.q53AnnIvf _),
    "q54_stream_stream_join" -> (StreamJoin.q54StreamStreamJoin _),
    "q55_hash_split"       -> (Sampling.q55HashSplit _),
    "q56_stratified_sample" -> (Sampling.q56StratifiedSample _),
    "q57_sequence_packing" -> (Sampling.q57SequencePacking _),
    "q58_latest_wins"      -> (Egress.q58LatestWins _),
    "q59_json_roundtrip"   -> (Egress.q59JsonRoundtrip _),
    "q60_orc_roundtrip"    -> (Egress.q60OrcRoundtrip _),
    "q61_correlated_subquery" -> (Relational.q61CorrelatedSubquery _),
    "q62_range_frame"      -> (Relational.q62RangeFrame _),
    "q63_multiset_setops"  -> (Relational.q63MultisetSetops _),
    "q64_nullsafe_join"    -> (Relational.q64NullSafeJoin _),
    "q65_top_bigrams"      -> (TextStats.q65TopBigrams _),
    "q66_exact_variance"   -> (Relational.q66ExactVariance _),
    "q67_corr_powersums"   -> (Relational.q67CorrPowerSums _),
    "q68_ngram_jaccard"    -> (Dedup.q68NgramJaccard _),
    "q69_dedup_clusters"   -> (Dedup.q69DedupClusters _),
    "q70_tfidf"            -> (TextStats.q70Tfidf _),
    "q71_scd2_history"     -> (Events.q71Scd2History _),
    "q72_window_nav"       -> (Relational.q72WindowNav _),
    "q73_profile_columns"  -> (Relational.q73ProfileColumns _),
    "q74_merge_apply"      -> (Egress.q74MergeApply _),
    "q75_compaction"       -> (Egress.q75Compaction _),
    "q76_asof_native"      -> (graft.plans.NativeAsOf.q76AsofNative _),
    "q77_unpivot"          -> (Relational.q77Unpivot _),
    "q78_nested_arrays"    -> (Relational.q78NestedArrays _),
    "q79_date_parsing"     -> (Relational.q79DateParsing _),
    "q80_salted_join"      -> (Scale.q80SaltedJoin _),
    "q81_stream_dedup"     -> (StreamDedup.q81StreamDedup _),
    "q82_stream_sessions"  -> (StreamSessions.q82StreamSessions _),
    "q83_stream_sink"      -> (StreamSink.q83StreamSinkRoundtrip _),
    "q84_pipeline_staged"  -> (graft.Pipeline.q84PipelineStaged _),
    "q85_global_index"     -> (Scale.q85GlobalIndex _),
    "q86_map_props"        -> (Events.q86MapProps _),
    "q87_vector_norm"      -> (Similarity.q87VectorNorm _),
    "q88_approx_percentiles" -> (Relational.q88ApproxPercentiles _),
    "q89_recursive_calendar" -> (ModernSql.q89RecursiveCalendar _),
    "q90_variant_props"    -> (ModernSql.q90VariantProps _),
    "q91_hll_rollup"       -> (ModernSql.q91HllRollup _),
    "q92_listagg"          -> (ModernSql.q92ListAgg _),
    "q93_regr_stats"       -> (ModernSql.q93RegrStats _),
    "q94_collation"        -> (ModernSql.q94Collation _),
    "q95_xml_parse"        -> (ModernSql.q95XmlParse _),
    "q96_incremental_rollup" -> (Egress.q96IncrementalRollup _),
    "q97_lateral_topn"     -> (ModernSql.q97LateralTopN _),
    "q98_ann_pq"           -> (Similarity.q98AnnPq _),
    "q99_outer_joins"      -> (Relational.q99OuterJoins _),
    "q100_gap_fill"        -> (Relational.q100GapFill _),
    "q101_moving_avg"      -> (Relational.q101MovingAvg _),
    "q102_observe"         -> (Quality.q102Observe _),
    "q103_na_fill"         -> (Quality.q103NaFill _),
    "q104_crosstab"        -> (Quality.q104Crosstab _),
    "q105_schema_evolution" -> (Quality.q105SchemaEvolution _),
    "q106_try_cast"        -> (Quality.q106TryCast _),
    "q107_levenshtein"     -> (Quality.q107Levenshtein _),
    "q108_session_window"  -> (Events.q108SessionWindow _),
    "q109_data_masking"    -> (Quality.q109DataMasking _),
    "q110_cogroup"         -> (Relational.q110Cogroup _),
    "q111_dynamic_overwrite" -> (Egress.q111DynamicOverwrite _),
    "q112_ema"             -> (Events.q112Ema _),
    "q113_decontamination" -> (Dedup.q113Decontamination _),
    "q114_intradoc_repetition" -> (TextStats.q114IntradocRepetition _),
    "q115_gopher_rules"    -> (TextStats.q115GopherRules _),
    "q116_stream_multibatch" -> (StreamingWindows.q116StreamMultibatch _),
    "q117_funnel"          -> (Events.q117Funnel _),
    "q118_retention"       -> (Events.q118Retention _),
    "q119_histogram"       -> (Events.q119Histogram _),
    "q120_stream_scoring"  -> (Similarity.q120StreamScoring _),
    "q121_chunking"        -> (TextStats.q121Chunking _),
    "q122_dedup_signals"   -> (Dedup.q122DedupSignals _),
    "q123_vocab_overlap"   -> (TextStats.q123VocabOverlap _),
    "q124_map_hofs"        -> (Events.q124MapHofs _),
    "q125_shortest_paths"  -> (Dedup.q125ShortestPaths _),
    "q126_sql_sugar"       -> (ModernSql.q126SqlSugar _),
    "q127_sql_scalar_udf"  -> (ModernSql.q127SqlScalarUdf _),
    "q128_sql_table_udf"   -> (ModernSql.q128SqlTableUdf _),
    "q129_approx_topk"     -> (ModernSql.q129ApproxTopK _),
    "q130_param_sql"       -> (ModernSql.q130ParamSql _),
    "q131_zorder_layout"   -> (Scale.q131ZorderLayout _),
    "q132_bloom_prefilter" -> (Scale.q132BloomPrefilter _),
    "q133_binary_ingest"   -> (Multimodal.q133BinaryIngest _),
    "q134_custom_source"   -> (Egress.q134CustomSource _),
    "q135_transform_with_state" ->
      (graft.streaming.StreamTransformState.q135TransformWithState _),
    "q136_stream_append_windows" ->
      (StreamingWindows.q136StreamAppendWindows _),
    "q137_default_columns" -> (Egress.q137DefaultColumns _),
    "q138_union_by_name"   -> (Relational.q138UnionByName _),
    "q139_stream_static_enrich" ->
      (graft.streaming.StreamJoin.q139StreamStaticEnrich _),
    "q140_media_transform" -> (Multimodal.q140MediaTransform _),
    "q141_kept_corpus"     -> (Dedup.q141KeptCorpus _),
    "q142_data_mixture"    -> (TextStats.q142DataMixture _),
    "q143_writer_v2"       -> (Egress.q143WriterV2 _),
    "q144_embed_quantize"  -> (Similarity.q144EmbedQuantize _),
    "q145_unigram_lm"      -> (TextStats.q145UnigramLm _),
    "q146_argmax"          -> (Relational.q146ArgMax _),
    "q147_bitmap_distinct" -> (Relational.q147BitmapDistinct _),
    "q148_json_infer"      -> (Events.q148JsonInfer _),
    "q149_tws_timers" ->
      (graft.streaming.StreamTransformState.q149TwsTimers _),
    "q150_pagerank"        -> (Dedup.q150PageRank _),
    "q151_bm25"            -> (TextStats.q151Bm25 _),
    "q152_sql_scripting"   -> (ModernSql.q152SqlScripting _),
    "q153_exec_immediate"  -> (ModernSql.q153ExecImmediate _),
    "q154_point_in_time"   -> (Events.q154PointInTime _),
    "q155_time_features"   -> (Events.q155TimeFeatures _),
    "q156_sentence_stats"  -> (TextStats.q156SentenceStats _),
    "q157_feature_hashing" -> (TextStats.q157FeatureHashing _),
    "q158_split_leakage"   -> (Sampling.q158SplitLeakage _),
    "q159_label_stats"     -> (Similarity.q159LabelStats _),
    "q160_outliers"        -> (Relational.q160Outliers _),
    "q161_oov_rate"        -> (TextStats.q161OovRate _),
    "q162_truncation_loss" -> (TextStats.q162TruncationLoss _),
    "q163_weighted_sample" -> (Sampling.q163WeightedSample _),
    "q164_corpus_diff"     -> (Egress.q164CorpusDiff _),
    "q165_stream_update_windows" ->
      (StreamingWindows.q165StreamUpdateWindows _),
    "q166_bool_aggs"       -> (Relational.q166BoolAggs _),
    "q167_skew_kurtosis"   -> (Relational.q167SkewKurtosis _),
    "q168_date_arith"      -> (Relational.q168DateArith _),
    "q169_binary_encode"   -> (TextStats.q169BinaryEncode _),
    "q170_string_toolkit"  -> (Events.q170StringToolkit _),
    "q171_window_dist"     -> (Relational.q171WindowDist _),
    "q172_sql_pipe"        -> (ModernSql.q172SqlPipe _),
    "q173_regexp_toolkit"  -> (TextStats.q173RegexpToolkit _),
    "q174_quantile_family" -> (Relational.q174QuantileFamily _),
    "q175_exists_subquery" -> (Relational.q175ExistsSubquery _),
    "q176_url_parse"       -> (TextStats.q176UrlParse _),
    "q177_grouping_id"     -> (Relational.q177GroupingId _),
    "q178_char_entropy"    -> (TextStats.q178CharEntropy _),
    "q179_bpe_pairs"       -> (TextStats.q179BpePairs _),
    "q180_pii_scan"        -> (Quality.q180PiiScan _),
    "q181_embed_centroid"  -> (Similarity.q181EmbedCentroid _),
    "q182_reused_exchange" -> (Scale.q182ReusedExchange _),
    "q183_join_hints"      -> (Scale.q183JoinHints _),
    "q184_stream_outer_join" ->
      (graft.streaming.StreamJoin.q184StreamOuterJoin _),
    "q185_interval_overlap" -> (AsOf.q185IntervalOverlap _),
    "q186_schema_contract" -> (Egress.q186SchemaContract _),
    "q187_partition_audit" -> (Egress.q187PartitionAudit _),
    "q188_equidepth_hist"  -> (Relational.q188EquiDepthHist _),
    "q189_intersect_all"   -> (Relational.q189IntersectAll _),
    "q190_filter_clause"   -> (Relational.q190FilterClause _),
    "q191_zipf_fit"        -> (TextStats.q191ZipfFit _),
    "q192_winsorize"       -> (Relational.q192Winsorize _),
    "q193_filter_waterfall" -> (TextStats.q193FilterWaterfall _),
    "q194_domain_policy"   -> (TextStats.q194DomainPolicy _),
    "q195_source_agg_pushdown" -> (Egress.q195SourceAggPushdown _),
    "q196_jdbc_roundtrip"  -> (Egress.q196JdbcRoundtrip _),
    "q197_stream_recovery" ->
      (graft.streaming.StreamRecovery.q197StreamRecovery _),
    "q198_dup_gram_profile" -> (Dedup.q198DupGramProfile _),
    "q199_shuffle_order"   -> (Sampling.q199ShuffleOrder _),
    "q200_length_buckets"  -> (TextStats.q200LengthBuckets _),
    "q201_sparse_cosine"   -> (TextStats.q201SparseCosine _),
    "q202_dwh_load"        -> (graft.Pipeline.q202DwhLoad _),
    "q203_bigram_ppl"      -> (TextStats.q203BigramPpl _),
    "q204_triangles"       -> (Dedup.q204Triangles _),
    "q205_embed_clusters"  -> (Similarity.q205EmbedClusters _),
    "q206_incremental_dedup" -> (Dedup.q206IncrementalDedup _),
    "q207_url_canonicalize" -> (TextStats.q207UrlCanonicalize _),
    "q208_json_quarantine" -> (Events.q208JsonQuarantine _),
    "q209_curation_pipeline" -> (Dedup.q209CurationPipeline _),
    "q210_chain_components" -> (Dedup.q210ChainComponents _),
    "q211_persisted_index_dedup" -> (Dedup.q211PersistedIndexDedup _),
    "q212_triangles_degree" -> (Dedup.q212TrianglesDegree _),
    "q213_banded_recall"   -> (Similarity.q213BandedRecall _),
    "q214_media_phash"     -> (Multimodal.q214MediaPhash _),
    "q215_cluster_reps"    -> (Dedup.q215ClusterRepresentatives _),
    "q216_contamination_spans" -> (Dedup.q216ContaminationSpans _),
    "q217_stream_index_dedup" ->
      (graft.streaming.StreamDedup.q217StreamIndexDedup _),
    "q218_boilerplate_spans" -> (Dedup.q218BoilerplateSpans _),
    "q219_span_excision"   -> (Dedup.q219SpanExcision _),
    "q220_corpus_drift"    -> (TextStats.q220CorpusDrift _),
    "q221_chi2_independence" -> (Quality.q221Chi2Independence _),
    "q222_kappa_agreement" -> (TextStats.q222KappaAgreement _),
    "q223_threshold_sweep" -> (Dedup.q223ThresholdSweep _),
    "q224_quality_dup_rate" -> (Dedup.q224QualityDupRate _),
    "q225_budget_selection" -> (Sampling.q225BudgetSelection _),
    "q226_minhash_calibration" -> (Dedup.q226MinhashCalibration _),
    "q227_pii_redaction"   -> (Quality.q227PiiRedaction _),
    "q228_shard_manifest"  -> (Sampling.q228ShardManifest _),
    "q229_cluster_downweight" -> (Dedup.q229ClusterDownweight _),
    "q230_fuzzy_join"      -> (Quality.q230FuzzyJoin _),
    "q231_overlap_profile" -> (Dedup.q231OverlapProfile _),
    "q232_hashed_classifier" -> (TextStats.q232HashedClassifier _),
    "q233_dpp_join"        -> (Scale.q233DppJoin _),
    "q234_hll_error_cert"  -> (Relational.q234HllErrorCert _),
    "q235_trigram_backoff" -> (TextStats.q235TrigramBackoff _),
    "q236_source_concentration" -> (TextStats.q236SourceConcentration _),
    "q237_stream_gate_bounded" ->
      (graft.streaming.StreamDedup.q237StreamGateBounded _),
    "q238_index_append"    -> (Dedup.q238IndexAppendMaintenance _),
    "q239_fuzzy_join_d2"   -> (Quality.q239FuzzyJoinD2 _),
    "q240_round_report"    -> (Dedup.q240RoundReport _),
    "q241_index_compaction" -> (Dedup.q241IndexCompaction _),
    "q242_incremental_cc"  -> (Dedup.q242IncrementalCC _),
    "q243_bpe_merges"      -> (TextStats.q243BpeMerges _),
    "q244_mixture_apply"   -> (Sampling.q244MixtureApply _),
    "q245_percentile_cert" -> (Relational.q245PercentileCert _),
    "q246_topk_cert"       -> (ModernSql.q246TopkCert _),
    "q247_hll_rollup_cert" -> (ModernSql.q247HllRollupCert _),
    "q248_kmeans_assign"   -> (Similarity.q248KmeansAssign _),
    "q249_semdedup"        -> (Similarity.q249SemDedup _),
    "q250_calibration"     -> (TextStats.q250CalibrationReport _),
    "q251_temperature_mix" -> (Sampling.q251TemperatureMixture _),
    "q252_dsir_select"     -> (Sampling.q252DsirSelect _),
    "q253_winnowing"       -> (Dedup.q253Winnowing _),
    "q254_label_knn"       -> (Similarity.q254LabelKnn _),
    "q255_ood_report"      -> (Similarity.q255OodReport _),
    "q256_prefix_dup"      -> (Dedup.q256PrefixDup _),
    "q257_hard_negatives"  -> (Similarity.q257HardNegatives _),
    "q258_source_gates"    -> (Quality.q258SourceGates _),
    "q259_embed_report"    -> (Similarity.q259EmbedReport _),
    "q260_stream_router"   -> (Similarity.q260StreamClusterRouter _),
    "q261_heaps_law"       -> (TextStats.q261HeapsLaw _),
    "q262_score_drift"     -> (Quality.q262ScoreDrift _),
    "q263_doc_chunks"      -> (Sampling.q263DocChunks _),
    "q264_cms_cert"        -> (TextStats.q264CmsCert _),
    "q265_k_anonymity"     -> (Quality.q265KAnonymity _),
    "q266_l_diversity"     -> (Quality.q266LDiversity _),
    "q267_bpe_encode"      -> (TextStats.q267BpeEncode _),
    "q268_mad_outliers"    -> (Quality.q268MadOutliers _),
    "q269_robust_clip"     -> (Quality.q269RobustClip _),
    "q270_split_repair"    -> (SplitRepair.q270SplitRepair _),
    "q271_skyline"         -> (Quality.q271Skyline _),
    "q272_acf"             -> (Events.q272Acf _),
    "q273_cusum"           -> (Events.q273Cusum _),
    "q274_dim_ablation"    -> (Similarity.q274DimAblation _),
    "q275_effective_mixture" -> (Dedup.q275EffectiveMixture _),
    "q276_linkage_weights" -> (Quality.q276LinkageWeights _),
    "q277_stream_cusum"    -> (Events.q277StreamCusum _),
    "q278_theil_sen"       -> (Events.q278TheilSen _),
    "q279_deletion_propagation" -> (Dedup.q279DeletionPropagation _),
    "q280_rank_fusion"     -> (Similarity.q280RankFusion _),
    "q281_ndcg_ablation"   -> (Similarity.q281NdcgAblation _),
    "q282_jackknife_se"    -> (Quality.q282JackknifeSe _),
    "q283_window_funnel"   -> (Events.q283WindowFunnel _),
    "q284_attribution"     -> (Events.q284Attribution _),
    "q285_seasonality"     -> (Events.q285SeasonalityProfile _),
    "q286_transition_matrix" -> (Events.q286TransitionMatrix _),
    "q287_kaplan_meier"    -> (Events.q287KaplanMeier _),
    "q288_top_paths"       -> (Events.q288TopPaths _),
    "q289_prefix_jaccard"  -> (Dedup.q289PrefixJaccardJoin _),
    "q290_band_recall"     -> (Dedup.q290BandRecallMeasured _),
    "q291_pmi_collocations" -> (TextStats.q291PmiCollocations _),
    "q292_market_basket"   -> (Relational.q292MarketBasket _),
    "q293_bot_profile"     -> (Events.q293BotProfile _),
    "q294_ivf_persisted"   -> (VectorIndex.q294IvfPersistedProbe _),
    "q295_ivf_append"      -> (VectorIndex.q295IvfAppendProbe _),
    "q296_pq_persisted"    -> (VectorIndex.q296PqPersistedProbe _),
    "q297_simhash_recall"  -> (Dedup.q297SimhashRecall _),
  )

  /** Queries intentionally without an oracle (non-SQL-expressible in
    * DuckDB, e.g. engine-specific hashes or approximate algorithms);
    * the driver records a weaker rows-only check for these. */
  def rowsOnly: Set[String] = Set(
    // HLL++ sketch differs from DuckDB's approx algorithm; the exact
    // oracle-checked twin is q10_count_distinct.
    "q22_approx_distinct",
    // xxhash64 sketch is engine-specific; oracle-checked dedup twins are
    // q24 (exact fingerprint) and q25 (MinHash, md5-portable).
    "q26_dedup_simhash",
    // approximate by design (LSH recall < 1); exact twins q27/q28.
    "q29_ann_lsh",
    // approximate by design (IVF nprobe < k); k-means centroid floats
    // are additionally engine-specific. Exact twins q27/q28.
    "q53_ann_ivf",
    // runs through the typed mapPartitions decode stub — JVM-side
    // logic DuckDB can't mirror; the metadata twin q43 is oracled.
    "q44_media_features",
    // GK-sketch percentiles are approximate by design; the exact
    // oracle-checked twin is q48_percentiles (error bounded in spec).
    "q88_approx_percentiles",
    // HLL sketch estimates are engine-specific; the exact twin is a
    // plain distinct count (error bounded in spec vs countDistinct).
    "q91_hll_rollup",
    // PQ codebooks (k-means) are engine-specific and recall < 1 by
    // design; exact twins q27/q28, recall floor asserted in spec.
    "q98_ann_pq",
    // frequency-sketch item selection under count ties is engine-
    // internal; counts are spec-checked against exact frequencies,
    // exact top-k twin is q65-style group+rank.
    "q129_approx_topk",
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared oracle for q206 AND q211: both emit the incremental
    * near-dup pair set (new batch × full corpus). q211 only changes
    * where the old side's bands come FROM — the persisted bucketed
    * index — which must be invisible in the result, so one oracle
    * text pins both. */
  private def incrementalDedupOracleFor(newMod: Int): String = s"""
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT LEAST(n.doc_id, o.doc_id) AS doc_a,
               GREATEST(n.doc_id, o.doc_id) AS doc_b
        FROM bands n
        JOIN bands o ON n.band = o.band AND n.band_key = o.band_key
          AND n.doc_id <> o.doc_id
        WHERE n.doc_id % 10 = $newMod)
      SELECT doc_a, doc_b,
        ROUND(CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE), 9)
          AS jaccard,
        CASE WHEN doc_a % 10 = $newMod AND doc_b % 10 = $newMod
             THEN 'new_new'
             ELSE 'new_old' END AS pair_type
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_a, doc_b"""

  private val incrementalDedupOracle: String = incrementalDedupOracleFor(7)

  /** Shared oracle for q204 AND q212: per-node triangle counts are
    * orientation-invariant, so the degree-ordered variant must be
    * bit-identical to the id-ordered one. */
  private val trianglesOracle: String = """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      tri AS (
        SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.doc_b = e2.doc_a
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
      deg AS (
        SELECT doc_id, COUNT(*) AS degree FROM (
          SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs) u
        GROUP BY doc_id),
      tn AS (
        SELECT doc_id, COUNT(*) AS n_triangles FROM (
          SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) u
        GROUP BY doc_id)
      SELECT d.doc_id, d.degree,
        COALESCE(tn.n_triangles, 0) AS n_triangles
      FROM deg d LEFT JOIN tn USING (doc_id)
      ORDER BY doc_id"""

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q2_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45""",

    "q3_join_agg" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "q4_broadcast_join" -> """
      SELECT p_brand, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size >= 40
      GROUP BY p_brand
      ORDER BY p_brand""",

    "q5_semi_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q6_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""",

    "q7_window_topn" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q8_window_running" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_qty
      FROM lineitem
      WHERE l_suppkey <= 10
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",

    "q9_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q10_count_distinct" -> """
      SELECT o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q11_setops" -> """
      SELECT nationkey, 'both' AS which FROM
        (SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
         INTERSECT
         SELECT CAST(c_nationkey AS INTEGER) FROM customer) t1
      UNION ALL
      SELECT nationkey, 'cust_only' AS which FROM
        (SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         EXCEPT
         SELECT CAST(s_nationkey AS INTEGER) FROM supplier) t2
      ORDER BY which, nationkey""",

    "q12_sort_limit" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10""",

    "q13_rollup" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q14_having" -> """
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 15
      ORDER BY o_custkey""",

    "q15_case_decode" -> """
      SELECT priority_clean, priority_meaning, COUNT(*) AS n FROM (
        SELECT
          CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
               THEN o_orderpriority ELSE 'OTHER' END AS priority_clean,
          CASE o_orderpriority
               WHEN '1-URGENT' THEN 'Urgente'
               WHEN '2-HIGH' THEN 'Alta'
               WHEN '3-MEDIUM' THEN 'Media'
               ELSE 'Desconocido' END AS priority_meaning
        FROM orders) t
      GROUP BY priority_clean, priority_meaning
      ORDER BY priority_clean""",

    "q16_date_agg" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
             CAST(MONTH(o_orderdate) AS INTEGER) AS mon,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2
      ORDER BY yr, mon""",

    "q17_string_funcs" -> """
      SELECT p_partkey,
        string_split(p_name, ' ')[1] AS name_first,
        TRIM(regexp_replace(p_name, '[aeiou]', '', 'g')) AS name_novowel,
        p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size
      FROM part
      WHERE p_name LIKE '%an%'
      ORDER BY p_partkey""",

    "q18_sql_surface" -> """
      SELECT o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_line_items,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""",

    "q19_cleanse_country" -> """
      SELECT c_custkey,
        CASE hit WHEN 'England' THEN 'United Kingdom'
                 WHEN 'Scotland' THEN 'United Kingdom'
                 WHEN 'Wales' THEN 'United Kingdom'
                 WHEN 'West Germany' THEN 'Germany'
                 ELSE hit END AS country_eu
      FROM (
        SELECT c_custkey,
          (list_filter(
             list_filter(
               list_transform(
                 string_split(
                   replace((['France, United Kingdom', '"England"', 'Peru',
                             '', ' West Germany , Spain '])
                           [CAST(c_custkey % 5 AS INTEGER) + 1], '"', ''),
                   ','),
                 x -> trim(x)),
               x -> x <> ''),
             x -> list_contains(
               ['United Kingdom','England','Scotland','Wales','Ireland',
                'Spain','France','Germany','West Germany','Italy','Portugal',
                'Netherlands','Belgium','Sweden','Norway','Denmark','Finland',
                'Poland','Czech Republic','Austria','Switzerland','Luxembourg',
                'Russia','Ukraine','Belarus','Turkey','Greece','Cyprus',
                'Iceland'], x)))[1] AS hit
        FROM customer) t
      WHERE hit IS NOT NULL
      ORDER BY c_custkey""",

    "q20_cleanse_pipeline" -> """
      SELECT doc_id,
        TRIM(replace(replace(substring(text, 1, 40), '"', ''), ',', ' -'))
          AS title,
        CASE WHEN lang IN ('en','fr','de','es') THEN lang
             ELSE 'UNKNOWN' END AS lang,
        CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INTEGER) AS src_num,
        CASE lang WHEN 'en' THEN 'English' WHEN 'fr' THEN 'French'
                  WHEN 'de' THEN 'German' WHEN 'es' THEN 'Spanish'
                  ELSE 'Desconocido' END AS lang_meaning,
        string_split(text, ' ')[1] AS first_word,
        CASE WHEN string_split(text, ' ')[1] LIKE '%join%' THEN 'Join'
             WHEN string_split(text, ' ')[1] LIKE '%merge%' THEN 'Join'
             WHEN string_split(text, ' ')[1] LIKE '%scan%' THEN 'Scan'
             WHEN string_split(text, ' ')[1] LIKE '%filter%' THEN 'Scan'
             WHEN string_split(text, ' ')[1] LIKE '%sort%' THEN 'Sort'
             WHEN string_split(text, ' ')[1] LIKE '%order%' THEN 'Sort'
             WHEN string_split(text, ' ')[1] LIKE '%group%' THEN 'Agg'
             WHEN string_split(text, ' ')[1] LIKE '%window%' THEN 'Agg'
             ELSE 'Other' END AS topic_group
      FROM documents
      WHERE n_chars >= 100
        AND regexp_replace(source, '[^0-9]', '', 'g') <> ''
        AND lang IN ('en','fr','de','es')
      ORDER BY doc_id""",

    "q21_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST""",

    "q23_top_brand_per_nation" -> """
      SELECT n_name, rk, p_brand, revenue FROM (
        SELECT n_name, p_brand, revenue,
          CAST(ROW_NUMBER() OVER (PARTITION BY n_name
               ORDER BY revenue DESC, p_brand ASC) AS INTEGER) AS rk
        FROM (
          SELECT n_name, p_brand,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
              AS revenue
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN part     ON l_partkey = p_partkey
          GROUP BY n_name, p_brand) agg) ranked
      WHERE rk <= 2
      ORDER BY n_name, rk""",

    "q24_dedup_exact" -> """
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY fp""",

    "q25_dedup_minhash" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_a, doc_b""",

    "q27_cosine_topk" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, e.vec_id,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE)
                   * CAST(e.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id)
      SELECT q_id, rank, vec_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        FROM scored) t
      WHERE rank <= 10
      ORDER BY q_id, rank""",

    // identical semantics to q27 via the typed-Aggregator path
    "q28_topk_udaf" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, e.vec_id,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE)
                   * CAST(e.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id)
      SELECT q_id, rank, vec_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        FROM scored) t
      WHERE rank <= 10
      ORDER BY q_id, rank""",

    "q30_embed_neardup" -> """
      SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE)
                 * CAST(b.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
      WHERE cosine >= 0.45
      ORDER BY vec_a, vec_b""",

    "q31_text_stats" -> """
      SELECT lang, source, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars,
        CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\s+',
          ' ', 'g')), ' '))) AS BIGINT) AS total_tokens,
        CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\s+',
          ' ', 'g')), ' '))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_tokens
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source""",

    "q32_lang_id" -> """
      WITH scored AS (
        SELECT lang,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '), t -> list_contains(['the','a'], t)))
            AS s_en,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['le','la','les'], t))) AS s_fr,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['der','die','das'], t))) AS s_de,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['el','los','una'], t))) AS s_es
        FROM documents)
      SELECT lang,
        CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
             WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
             WHEN s_de >= s_es THEN 'de'
             ELSE 'es' END AS predicted,
        COUNT(*) AS n_docs
      FROM scored
      GROUP BY 1, 2
      ORDER BY lang, predicted""",

    "q33_quality_score" -> """
      WITH n AS (
        SELECT doc_id, lang,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents)
      SELECT doc_id, lang,
        CAST(len(w) AS INTEGER) AS n_tokens,
        CAST(length(replace(norm, ' ', '')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE) AS avg_token_len,
        CAST(len(list_filter(w, t -> list_contains(['the','a'], t)))
          AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio,
        CAST(length(regexp_replace(norm, '[^0-9]', '', 'g')) AS DOUBLE)
          / CAST(length(norm) AS DOUBLE) AS digit_ratio,
        CASE WHEN len(w) >= 50
                  AND CAST(len(list_filter(w, t ->
                    list_contains(['the','a'], t))) AS DOUBLE)
                    / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
             WHEN len(w) >= 20 THEN 'medium'
             ELSE 'low' END AS quality
      FROM n
      ORDER BY doc_id""",

    "q34_token_count" -> """
      WITH perdoc AS (
        SELECT lang,
          len(regexp_extract_all(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents)
      , sums AS (
        SELECT lang, CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
               CAST(SUM(len(w)) AS BIGINT) AS total_ws
        FROM perdoc GROUP BY lang),
      vocab AS (
        SELECT lang, COUNT(DISTINCT word) AS vocab
        FROM (SELECT lang, unnest(w) AS word FROM perdoc)
        GROUP BY lang)
      SELECT s.lang, total_bpe, total_ws, vocab
      FROM sums s JOIN vocab v ON s.lang = v.lang
      ORDER BY s.lang""",

    "q35_doc_fingerprint" -> """
      SELECT doc_id,
        CAST(length(norm) - 7 AS INTEGER) AS n_shingles,
        list_min(list_transform(range(1, length(norm) - 6),
          i -> md5(substring(norm, CAST(i AS INTEGER), 8)))) AS fp
      FROM (SELECT doc_id,
              trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
            FROM documents) t
      WHERE length(norm) >= 8
      ORDER BY doc_id""",

    "q36_event_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "q37_event_hopping" -> """
      SELECT win_start, event_type, COUNT(*) AS n_events FROM (
        SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                 - o * INTERVAL 5 MINUTE AS win_start,
               event_type
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) t) h
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type""",

    "q38_sessionize" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        COUNT(*) AS n_events,
        MIN(tsx) AS session_start,
        CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE) / 1000000.0
          AS duration_sec
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",

    // streaming twin of q36 (counts only): AvailableNow drain ==
    // batch result, so the same bucketing SQL oracles the stream
    "q39_stream_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "q40_json_props" -> """
      SELECT event_type, COUNT(*) AS n_events,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS distinct_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    // oracle runs on the ORIGINAL parquet — the round-trip through
    // CSV zones must reproduce it exactly
    "q41_csv_roundtrip" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q42_catalog_table" -> """
      SELECT n_regionkey, COUNT(*) AS n_nations,
        MIN(n_name) AS first_nation
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey""",

    "q43_multimodal_meta" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        CAST(320 + ascii(substring(md5(text), 1, 1)) * 8 AS INTEGER)
          AS width,
        CAST(240 + ascii(substring(md5(text), 2, 1)) * 4 AS INTEGER)
          AS height,
        CASE WHEN doc_id % 3 = 0 THEN 0
             ELSE CAST(octet_length(encode(text)) AS BIGINT) * 10
             END AS duration_ms
      FROM documents
      ORDER BY doc_id""",

    "q45_bucketed_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q46_partition_pruning" -> """
      SELECT CAST(MONTH(o_orderdate) AS INTEGER) AS mon,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE YEAR(o_orderdate) = 1997
      GROUP BY 1
      ORDER BY mon""",

    "q47_salted_agg" -> """
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q48_percentiles" -> """
      SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        quantile_cont(o_totalprice, 0.99) AS p99,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q49_pivot" -> """
      SELECT o_orderstatus,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
          AS "1-URGENT",
        COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
          AS "2-HIGH",
        COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
          AS "3-MEDIUM",
        COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
          AS "4-NOT SPECIFIED",
        COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
          AS "5-LOW"
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q50_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INT) AS g_status,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST""",

    "q51_asof_join" -> """
      WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS sts
                 FROM events WHERE event_type = 'signup'),
      e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type
            FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        COUNT(sts) AS n_with_signup,
        MAX(epoch_us(ts) - epoch_us(sts)) AS max_lag_us
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.ts >= s.sts
      GROUP BY event_type
      ORDER BY event_type""",

    "q52_range_join" -> """
      WITH bands AS (
        SELECT 'band_' || CAST(i AS VARCHAR) AS band,
               i * 100.0 AS lo, (i + 1) * 100.0 AS hi
        FROM (SELECT unnest(range(5)) AS i))
      SELECT band, COUNT(*) AS n_events,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM events JOIN bands ON value >= lo AND value < hi
      GROUP BY band
      ORDER BY band""",

    // AvailableNow drains the bounded input, so the stream-stream
    // interval join equals the batch interval join
    "q54_stream_stream_join" -> """
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts,
                        event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id AS p_user_id, CAST(ts AS TIMESTAMP) AS buy_ts,
                   event_id AS buy_id
            FROM events WHERE event_type = 'purchase')
      SELECT click_id, buy_id, user_id, click_ts, buy_ts
      FROM c JOIN p ON user_id = p_user_id
        AND buy_ts >= click_ts
        AND buy_ts <= click_ts + INTERVAL 10 MINUTE
      ORDER BY click_id, buy_id""",

    "q55_hash_split" -> """
      SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             lang, COUNT(*) AS n_docs
      FROM documents
      GROUP BY 1, 2
      ORDER BY split, lang""",

    "q56_stratified_sample" -> """
      SELECT lang, rn, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
            AS INTEGER) AS rn
        FROM documents) t
      WHERE rn <= 20
      ORDER BY lang, rn""",

    "q57_sequence_packing" -> """
      WITH d AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      c AS (
        SELECT shard, doc_id, tokens,
          CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM d)
      SELECT shard, (cum_tokens - tokens) // 2048 AS bin,
        COUNT(*) AS n_docs,
        CAST(SUM(tokens) AS BIGINT) AS total_tokens
      FROM c
      GROUP BY shard, bin
      ORDER BY shard, bin""",

    "q58_latest_wins" -> """
      SELECT user_id, event_id, tsx AS ts, event_type, value FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
               event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id""",

    // oracle on the original parquet: the jsonl cycle must reproduce it
    "q59_json_roundtrip" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    "q60_orc_roundtrip" -> """
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q61_correlated_subquery" -> """
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_totalprice > 300000) >= 2
      ORDER BY c_custkey""",

    "q62_range_frame" -> """
      SELECT o_orderkey, o_custkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS trailing_total
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q63_multiset_setops" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS surplus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity > 25
        EXCEPT ALL
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity <= 25) t
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q64_nullsafe_join" -> """
      WITH a AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS pr, COUNT(*) AS n_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      b AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS pr_b, COUNT(*) AS n_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
      SELECT pr, n_f, n_o
      FROM a JOIN b ON pr IS NOT DISTINCT FROM pr_b
      ORDER BY pr NULLS FIRST""",

    "q65_top_bigrams" -> """
      WITH words AS (
        SELECT lang,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      bg AS (
        SELECT lang,
          unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS bigram
        FROM words WHERE len(w) >= 2),
      counts AS (
        SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
      SELECT lang, rn, bigram, n FROM (
        SELECT lang, bigram, n,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY n DESC, bigram ASC) AS INTEGER) AS rn
        FROM counts) t
      WHERE rn <= 5
      ORDER BY lang, rn""",

    "q66_exact_variance" -> """
      WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
          SUM(CAST(l_quantity AS DECIMAL(18,2))
              * CAST(l_quantity AS DECIMAL(18,2))) AS sxx
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, n,
        CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS var_pop_qty
      FROM s
      ORDER BY l_returnflag""",

    "q67_corr_powersums" -> """
      WITH s AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sxy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
        ROUND((n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
          AS corr_qty_price
      FROM s
      ORDER BY l_returnflag""",

    "q68_ngram_jaccard" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      ix AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      rare AS (SELECT s FROM ix GROUP BY s HAVING COUNT(*) <= 20),
      pruned AS (SELECT ix.doc_id, ix.s FROM ix JOIN rare USING (s)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pruned a
        JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.6
      ORDER BY doc_a, doc_b""",

    // same MinHash edge set as q25, then connected components as a
    // recursive transitive closure with min-reachable-id labels
    "q69_dedup_clusters" -> dedupClustersOracle,

    "q70_tfidf" -> """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      df AS (
        SELECT word, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, word FROM w2) d
        GROUP BY word),
      n AS (SELECT COUNT(*) AS n_total FROM documents),
      tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM w2 WHERE doc_id < 20
        GROUP BY doc_id, word),
      scored AS (
        SELECT doc_id, word, tf, df.df,
          ROUND(CAST(tf AS DOUBLE)
            * ln(CAST(n_total AS DOUBLE) / CAST(df.df AS DOUBLE)), 9)
            AS score
        FROM tf JOIN df USING (word) CROSS JOIN n)
      SELECT doc_id, rn, word, tf, df, score FROM (
        SELECT doc_id, word, tf, df, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, word ASC) AS INTEGER) AS rn
        FROM scored) t
      WHERE rn <= 3
      ORDER BY doc_id, rn""",

    "q71_scd2_history" -> """
      SELECT user_id, event_id, tsx AS valid_from, valid_to, event_type,
             value, CAST(valid_to IS NULL AS INTEGER) AS is_current
      FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lead(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
          event_type, value
        FROM events WHERE user_id < 30) t
      ORDER BY user_id, valid_from, event_id""",

    "q72_window_nav" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice) OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        first_value(o_totalprice) OVER wf AS first_price,
        last_value(o_totalprice) OVER wf AS last_price,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        ROUND(percent_rank() OVER w, 9) AS pct_rank
      FROM orders
      WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",

    "q73_profile_columns" -> """
      WITH s AS (
        SELECT COUNT(*) AS n_rows,
          COUNT(o_orderstatus) AS nn_st,
          COUNT(DISTINCT o_orderstatus) AS nd_st,
          MIN(o_orderstatus) AS min_st, MAX(o_orderstatus) AS max_st,
          COUNT(o_orderpriority) AS nn_pr,
          COUNT(DISTINCT o_orderpriority) AS nd_pr,
          MIN(o_orderpriority) AS min_pr, MAX(o_orderpriority) AS max_pr,
          COUNT(o_custkey) AS nn_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
          CAST(MIN(o_custkey) AS DOUBLE) AS min_ck,
          CAST(MAX(o_custkey) AS DOUBLE) AS max_ck,
          COUNT(o_totalprice) AS nn_tp,
          COUNT(DISTINCT o_totalprice) AS nd_tp,
          CAST(MIN(o_totalprice) AS DOUBLE) AS min_tp,
          CAST(MAX(o_totalprice) AS DOUBLE) AS max_tp
        FROM orders)
      SELECT * FROM (
        SELECT 'o_orderstatus' AS col_name, n_rows,
          n_rows - nn_st AS n_nulls, nd_st AS n_distinct,
          CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
          min_st AS min_str, max_st AS max_str FROM s
        UNION ALL
        SELECT 'o_orderpriority', n_rows, n_rows - nn_pr, nd_pr,
          NULL, NULL, min_pr, max_pr FROM s
        UNION ALL
        SELECT 'o_custkey', n_rows, n_rows - nn_ck, nd_ck,
          min_ck, max_ck, NULL, NULL FROM s
        UNION ALL
        SELECT 'o_totalprice', n_rows, n_rows - nn_tp, nd_tp,
          min_tp, max_tp, NULL, NULL FROM s) u
      ORDER BY col_name""",

    "q74_merge_apply" -> """
      WITH ev AS (
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_id < 1500),
      base AS (SELECT * FROM ev WHERE event_id % 2 = 0),
      chg AS (
        SELECT event_id, user_id, event_type, value + 1000 AS value,
          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM ev WHERE event_id % 3 = 0)
      SELECT COALESCE(c.event_id, b.event_id) AS event_id,
        COALESCE(c.user_id, b.user_id) AS user_id,
        COALESCE(c.event_type, b.event_type) AS event_type,
        COALESCE(c.value, b.value) AS value,
        CASE WHEN c.event_id IS NOT NULL THEN 'chg' ELSE 'base' END AS src
      FROM base b FULL OUTER JOIN chg c ON b.event_id = c.event_id
      WHERE COALESCE(c.op, '') <> 'D'
      ORDER BY event_id""",

    // oracle on the original parquet: the small-file + compaction
    // cycle must preserve every row exactly
    "q75_compaction" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        COUNT(DISTINCT doc_id) AS n_distinct_docs
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // identical semantics to q51, executed by the custom
    // AsOfJoinExec physical operator instead of the union+window plan
    "q76_asof_native" -> """
      WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS sts
                 FROM events WHERE event_type = 'signup'),
      e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type
            FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        COUNT(sts) AS n_with_signup,
        MAX(epoch_us(ts) - epoch_us(sts)) AS max_lag_us
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.ts >= s.sts
      GROUP BY event_type
      ORDER BY event_type""",

    // pivot → unpivot round trip equals the plain long-form group-by
    "q77_unpivot" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority""",

    "q78_nested_arrays" -> """
      SELECT o_custkey,
        CAST(len(l) AS INTEGER) AS n_orders,
        l[1] AS top1,
        list_reduce(l[1:3], (acc, x) -> acc + x) AS top3_sum
      FROM (
        SELECT o_custkey,
          list_sort(list(o_totalprice), 'DESC') AS l
        FROM orders GROUP BY o_custkey) t
      ORDER BY o_custkey""",

    "q79_date_parsing" -> """
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS dstr,
        strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS parsed,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY,
          '%Y-%m-%d') AS plus30,
        strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
          '%Y-%m-%d') AS month_start,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
          AS month_end,
        CAST(date_diff('day', CAST(o_orderdate AS DATE),
          DATE '1998-12-31') AS BIGINT) AS days_to_end
      FROM orders
      WHERE o_orderkey < 2000
      ORDER BY o_orderkey""",

    // the surviving fingerprint SET equals exact batch dedup; which
    // copy survives is arrival-dependent, so only the set is compared
    "q81_stream_dedup" -> """
      SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ',
        'g'))) AS fp
      FROM documents
      ORDER BY fp""",

    // sessions CLOSED during the AvailableNow drain: every non-final
    // session per user (closed inline by gap exceedance) plus final
    // sessions old enough that the post-drain watermark (max_ts - 30m
    // delay) passed last_event + 30m gap and fired the event-time
    // timeout. Validated as an exact set match against the stream.
    // identical closed-session set as q82 — the state-v2 timer
    // path must reproduce the flatMapGroupsWithState semantics
    "q149_tws_timers" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      agg AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
          epoch_us(MIN(tsx)) AS session_start_us,
          epoch_us(MAX(tsx)) AS last_us,
          CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE)
            / 1000000.0 AS duration_sec,
          sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        FROM sess GROUP BY user_id, sid),
      mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS m FROM events)
      SELECT user_id, session_start_us, n_events, duration_sec
      FROM agg, mx
      WHERE (NOT is_last)
         OR ((last_us + 1800000000) // 1000 < (m // 1000) - 1800000)
      ORDER BY user_id, session_start_us""",

    "q82_stream_sessions" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      agg AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
          epoch_us(MIN(tsx)) AS session_start_us,
          epoch_us(MAX(tsx)) AS last_us,
          CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE)
            / 1000000.0 AS duration_sec,
          sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        FROM sess GROUP BY user_id, sid),
      mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS m FROM events)
      SELECT user_id, session_start_us, n_events, duration_sec
      FROM agg, mx
      WHERE (NOT is_last)
         OR ((last_us + 1800000000) // 1000 < (m // 1000) - 1800000)
      ORDER BY user_id, session_start_us""",

    // foreachBatch parquet landing must equal the batch window counts
    "q83_stream_sink" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // oracle on the ORIGINAL parquet: the staged extract→transform→
    // load cycle (latest-file pick included) must reproduce it
    "q84_pipeline_staged" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        COUNT(DISTINCT c_nationkey) AS n_nations,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // distributed two-phase ranking must equal the single-sequence
    // ROW_NUMBER over the same total order
    "q85_global_index" -> """
      SELECT o_orderkey, o_custkey, o_totalprice,
        ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
          AS rank
      FROM orders
      ORDER BY rank""",

    "q86_map_props" -> """
      WITH kv AS (
        SELECT event_type, unnest(json_keys(props)) AS key, props
        FROM events)
      SELECT event_type, key, COUNT(*) AS n,
        MIN(CAST(json_extract_string(props, '$.' || key) AS INTEGER))
          AS min_v,
        MAX(CAST(json_extract_string(props, '$.' || key) AS INTEGER))
          AS max_v,
        COUNT(DISTINCT CAST(json_extract_string(props, '$.' || key)
          AS INTEGER)) AS distinct_v
      FROM kv
      GROUP BY event_type, key
      ORDER BY event_type, key""",

    "q87_vector_norm" -> """
      SELECT vec_id,
        CAST(len(embedding) AS INTEGER) AS dim,
        sqrt(list_reduce(list_transform(range(1, 65),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
          (x, y) -> x + y)) AS l2_norm,
        list_max(list_transform(embedding,
          x -> abs(CAST(x AS DOUBLE)))) AS max_abs,
        CAST(embedding[1] AS DOUBLE)
          / sqrt(list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE)
                 * CAST(embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) AS unit_first
      FROM embeddings
      ORDER BY vec_id""",

    "q89_recursive_calendar" -> """
      WITH RECURSIVE bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
               CAST(MAX(o_orderdate) AS DATE) AS mx
        FROM orders),
      months (m, mn0, mx) AS (
        SELECT CAST(date_trunc('month', mn) AS DATE), mn, mx FROM bounds
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mn0, mx FROM months
        WHERE m + INTERVAL 1 MONTH <= mx),
      cal AS (
        SELECT unnest(generate_series(greatest(m, mn0),
          least(CAST(last_day(m) AS DATE), mx), INTERVAL 1 DAY)) AS d
        FROM months),
      order_days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders)
      SELECT CAST(year(d) AS INTEGER) AS yr,
        CAST(month(d) AS INTEGER) AS mon,
        COUNT(*) AS n_days,
        CAST(SUM(CASE WHEN od IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_gap_days
      FROM cal LEFT JOIN order_days ON d = od
      GROUP BY year(d), month(d)
      ORDER BY yr, mon""",

    "q90_variant_props" -> """
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    "q92_listagg" -> """
      SELECT r_name, COUNT(*) AS n_nations,
        string_agg(n_name, ',' ORDER BY n_name) AS members
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    "q93_regr_stats" -> """
      SELECT l_returnflag,
        CAST(regr_count(y, x) AS BIGINT) AS n,
        ROUND(regr_slope(y, x), 6) AS slope,
        ROUND(regr_intercept(y, x), 6) AS intercept,
        ROUND(regr_r2(y, x), 6) AS r2
      FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
                   CAST(l_extendedprice AS DOUBLE) AS y
            FROM lineitem) t
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q94_collation" -> """
      SELECT MIN(l) AS lang_repr, COUNT(*) AS n
      FROM (SELECT lang AS l FROM documents
            UNION ALL SELECT upper(lang) FROM documents) t
      GROUP BY lower(l)
      ORDER BY lang_repr""",

    // oracle on the original columns: the XML serialize→parse cycle
    // must be lossless
    "q95_xml_parse" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        COUNT(DISTINCT doc_id) AS n_distinct_docs
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    "q99_outer_joins" -> """
      WITH cust AS (SELECT c_custkey FROM customer
                    WHERE c_custkey % 3 = 0),
      big AS (SELECT o_custkey, o_orderkey FROM orders
              WHERE o_totalprice > 300000),
      l AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust LEFT JOIN big ON c_custkey = o_custkey),
      r AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust RIGHT JOIN big ON c_custkey = o_custkey),
      f AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey)
      SELECT 'left' AS join_type, m AS n_matched, lo AS n_left_only,
             ro AS n_right_only FROM l
      UNION ALL
      SELECT 'right', m, lo, ro FROM r
      UNION ALL
      SELECT 'full_outer', m, lo, ro FROM f
      ORDER BY join_type""",

    "q100_gap_fill" -> """
      SELECT user_id, event_id, tsx AS ts, reading,
        last_value(reading IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY tsx, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          CASE WHEN event_type = 'error' THEN NULL ELSE value END
            AS reading
        FROM events) t
      WHERE user_id < 50
      ORDER BY user_id, tsx, event_id""",

    "q101_moving_avg" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
          / CAST(COUNT(*) OVER w AS DOUBLE) AS ma_qty
      FROM lineitem
      WHERE l_suppkey <= 10
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",

    // the observed metrics must equal a direct aggregation
    "q102_observe" -> """
      SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN o_totalprice > 300000 THEN 1 END) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders""",

    "q103_na_fill" -> """
      SELECT CASE WHEN doc_id % 7 = 0 THEN 'unknown' ELSE lang END
               AS lang,
        COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE n_chars END)
          AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1
      ORDER BY lang""",

    "q104_crosstab" -> """
      SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
          AS "1-URGENT",
        COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
          AS "2-HIGH",
        COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
          AS "3-MEDIUM",
        COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
          AS "4-NOT SPECIFIED",
        COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
          AS "5-LOW"
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // availability of `source` follows the batch split exactly
    "q105_schema_evolution" -> """
      SELECT lang, COUNT(*) AS n_docs,
        COUNT(CASE WHEN doc_id % 2 = 1 THEN source END)
          AS n_with_source,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    "q106_try_cast" -> """
      SELECT o_orderstatus, COUNT(*) AS n,
        COUNT(ratio) AS n_divisible,
        MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
        COUNT(bad_cast) AS n_cast_ok
      FROM (
        SELECT o_orderstatus,
          o_totalprice / NULLIF(o_custkey % 3, 0) AS ratio,
          TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
        FROM orders) t
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q107_levenshtein" -> """
      SELECT a.n_name AS name_a, b.n_name AS name_b,
        CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist
      FROM nation a JOIN nation b ON a.n_name < b.n_name
      WHERE levenshtein(a.n_name, b.n_name) <= 6
      ORDER BY name_a, name_b""",

    // native session_window: new session at gap >= 30 min (an event at
    // exactly last+gap falls outside the [start, last+gap) window)
    "q108_session_window" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) >= 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, MIN(tsx) AS session_start, COUNT(*) AS n_events
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    // masking/pseudonymization verified against the original values
    "q109_data_masking" -> """
      SELECT c_custkey,
        regexp_replace(regexp_replace(regexp_replace(c_name,
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
          AS masked_name,
        sha256(c_name) AS pseudonym,
        c_name AS roundtrip_name
      FROM customer
      WHERE c_custkey <= 200
      ORDER BY c_custkey""",

    "q110_cogroup" -> """
      SELECT o_orderkey, o_totalprice,
        COUNT(l_orderkey) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_qty
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_totalprice > 400000
      GROUP BY o_orderkey, o_totalprice
      ORDER BY o_orderkey""",

    // partial re-delivery: only 1997 is replaced (price doubled), all
    // other partitions must be byte-identical to the first write
    "q111_dynamic_overwrite" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1997
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
                      ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
          AS DOUBLE) AS total
      FROM orders
      GROUP BY 1
      ORDER BY o_year""",

    // same sequential fold: list_reduce over the ts-ordered values
    // seeds with the first element exactly like the mapGroups loop
    "q112_ema" -> """
      SELECT user_id, COUNT(*) AS n_events,
        ROUND(list_reduce(
          list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
          (acc, x) -> 0.1 * x + 0.9 * acc), 9) AS ema_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    "q113_decontamination" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      grams AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM d8),
      ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      train AS (SELECT * FROM grams WHERE doc_id % 10 <> 0)
      SELECT doc_id, COUNT(DISTINCT gram) AS n_shared_grams
      FROM train JOIN ev USING (gram)
      GROUP BY doc_id
      ORDER BY doc_id""",

    "q114_intradoc_repetition" -> """
      SELECT doc_id,
        CAST(len(segs) AS INTEGER) AS n_segments,
        CAST(len(list_distinct(segs)) AS INTEGER) AS n_unique,
        ROUND(1.0 - CAST(len(list_distinct(segs)) AS DOUBLE)
          / CAST(len(segs) AS DOUBLE), 9) AS repetition_ratio
      FROM (
        SELECT doc_id,
          list_filter(list_transform(string_split(lower(text), '. '),
            s -> trim(s)), s -> s <> '') AS segs
        FROM documents) t
      WHERE len(segs) >= 1
      ORDER BY doc_id""",

    "q115_gopher_rules" -> """
      WITH t AS (
        SELECT doc_id, lang,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents)
      SELECT doc_id, lang,
        CAST(len(w) AS INTEGER) AS n_tokens,
        len(w) BETWEEN 20 AND 100000 AS ok_length,
        (CAST(length(replace(norm, ' ', '')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0
          AS ok_mean_word_len,
        len(list_filter(w, x -> list_contains(
          ['the', 'a', 'of', 'to', 'and'], x))) >= 1 AS ok_stopwords,
        ROUND(CAST(len(list_filter(w, x ->
          regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
          / CAST(len(w) AS DOUBLE), 9) AS alpha_frac,
        CAST(len(list_filter(w, x -> regexp_matches(x, '^[a-z]+$')))
          AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.5 AS ok_alpha,
        (len(w) BETWEEN 20 AND 100000)
          AND ((CAST(length(replace(norm, ' ', '')) AS DOUBLE)
            / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0)
          AND (len(list_filter(w, x -> list_contains(
            ['the', 'a', 'of', 'to', 'and'], x))) >= 1)
          AND (CAST(len(list_filter(w, x ->
            regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
            / CAST(len(w) AS DOUBLE) >= 0.5) AS pass
      FROM t
      ORDER BY doc_id""",

    // cross-batch state merge must equal the batch aggregation
    "q116_stream_multibatch" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "q117_funnel" -> """
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      s AS (SELECT user_id, MIN(ts) AS s_ts FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.s_ts
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
            GROUP BY e.user_id)
      SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s
      UNION ALL
      SELECT '2_click_after', COUNT(*) FROM c
      UNION ALL
      SELECT '3_purchase_after', COUNT(*) FROM p
      ORDER BY step""",

    "q118_retention" -> """
      WITH weekly AS (
        SELECT DISTINCT user_id,
          date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        FROM events),
      firstwk AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weekly
        GROUP BY user_id)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER)
          AS week_offset,
        COUNT(*) AS n_users
      FROM weekly JOIN firstwk USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_week, week_offset""",

    // width_bucket(v, 0, 500, 20): under→0, over→21, else floor/25+1
    "q119_histogram" -> """
      SELECT CASE WHEN value < 0 THEN 0
                  WHEN value >= 500 THEN 21
                  ELSE CAST(FLOOR(value / 25) AS BIGINT) + 1
             END AS bucket,
        COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY bucket""",

    // stateless stream scoring drain == the batch threshold filter
    "q120_stream_scoring" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5)
      SELECT q_id, e.vec_id,
        list_reduce(list_transform(range(1, 65),
          i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
          (x, y) -> x + y)
        / sqrt(
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
            (x, y) -> x + y)
          * list_reduce(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
        AND list_reduce(list_transform(range(1, 65),
          i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
          (x, y) -> x + y)
        / sqrt(
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
            (x, y) -> x + y)
          * list_reduce(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) >= 0.3
      ORDER BY q_id, vec_id""",

    "q121_chunking" -> """
      WITH n AS (
        SELECT doc_id,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents),
      k AS (
        SELECT doc_id, norm,
          unnest(range(0, (length(norm) - 1) // 100 + 1)) AS kk
        FROM n WHERE length(norm) > 0)
      SELECT doc_id, CAST(kk AS INTEGER) AS chunk_ix,
        CAST(length(substring(norm, CAST(kk * 100 + 1 AS INTEGER), 200))
          AS INTEGER) AS chunk_len,
        md5(substring(norm, CAST(kk * 100 + 1 AS INTEGER), 200))
          AS chunk_hash
      FROM k
      ORDER BY doc_id, chunk_ix""",

    // union of the two near-dup signals with provenance; the embedding
    // side mirrors the sign-LSH candidate generation (4 tables × 4
    // sign bits over dims 1..16 — a pure sign test, no float
    // arithmetic, so bucket membership is engine-portable)
    "q122_dedup_signals" -> """
      SELECT vec_a AS id_a, vec_b AS id_b, 'embedding' AS signal,
        ROUND(cosine, 9) AS score
      FROM (
        WITH bk AS (
          SELECT vec_id, CAST(t.tbl AS INTEGER) AS tbl,
            (CASE WHEN embedding[CAST(t.tbl * 4 + 1 AS INTEGER)] >= 0
                  THEN 1 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 2 AS INTEGER)] >= 0
                  THEN 2 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 3 AS INTEGER)] >= 0
                  THEN 4 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 4 AS INTEGER)] >= 0
                  THEN 8 ELSE 0 END) AS bucket
          FROM embeddings CROSS JOIN
            (SELECT unnest(range(4)) AS tbl) t),
        cand AS (
          SELECT DISTINCT ba.vec_id AS vec_a, bb.vec_id AS vec_b
          FROM bk ba JOIN bk bb
            ON ba.tbl = bb.tbl AND ba.bucket = bb.bucket
            AND ba.vec_id < bb.vec_id)
        SELECT vec_a, vec_b,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE)
                 * CAST(b.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM cand
        JOIN embeddings a ON a.vec_id = vec_a
        JOIN embeddings b ON b.vec_id = vec_b) p
      WHERE cosine >= 0.45
      UNION ALL
      SELECT doc_a, doc_b, 'text_ngram', ROUND(jaccard, 9) FROM (
        WITH words AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ',
              'g')), ' ') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1])) AS shl
          FROM words WHERE len(w) >= 2),
        ix AS (SELECT doc_id, unnest(shl) AS s FROM sh),
        rare AS (SELECT s FROM ix GROUP BY s HAVING COUNT(*) <= 20),
        pruned AS (SELECT ix.doc_id, ix.s FROM ix JOIN rare USING (s)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM pruned a
          JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.6) t
      ORDER BY signal, id_a, id_b""",

    "q123_vocab_overlap" -> """
      WITH wcount AS (
        SELECT lang, word, COUNT(*) AS n FROM (
          SELECT lang,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''
        GROUP BY lang, word),
      top AS (
        SELECT lang, word FROM (
          SELECT lang, word,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY n DESC, word ASC) AS rk
          FROM wcount) t
        WHERE rk <= 50),
      voc AS (SELECT lang, list_sort(list(word)) AS vocab FROM top
              GROUP BY lang)
      SELECT a.lang AS lang_a, b.lang AS lang_b,
        CAST(len(list_intersect(a.vocab, b.vocab)) AS INTEGER)
          AS n_common,
        ROUND(CAST(len(list_intersect(a.vocab, b.vocab)) AS DOUBLE)
          / CAST(len(list_distinct(a.vocab || b.vocab)) AS DOUBLE), 9)
          AS vocab_jaccard
      FROM voc a JOIN voc b ON a.lang < b.lang
      ORDER BY lang_a, lang_b""",

    "q124_map_hofs" -> """
      SELECT event_type, COUNT(*) AS n_events,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2)
          AS min_k2,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2)
          AS max_k2,
        CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
          AS INTEGER) >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    // BFS distances from the smallest doc in the MinHash edge set;
    // the recursive CTE mirrors the hop loop (MIN over path lengths)
    "q125_shortest_paths" -> """
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      src AS (SELECT MIN(doc_a) AS s FROM edges),
      bfs (doc_id, dist) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT e.doc_b, b.dist + 1
        FROM bfs b JOIN edges e ON b.doc_id = e.doc_a
        WHERE b.dist < 20),
      final AS (
        SELECT doc_id, MIN(dist) AS dist FROM bfs GROUP BY doc_id)
      SELECT doc_id, CAST(dist AS INTEGER) AS dist
      FROM final
      ORDER BY doc_id""",

    "q97_lateral_topn" -> """
      SELECT n_name, c_name, c_acctbal
      FROM nation,
      LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2) top_cust
      ORDER BY n_name, c_acctbal DESC, c_name""",

    // full recompute: merged partials must equal it exactly
    "q96_incremental_rollup" -> """
      SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2
      ORDER BY o_orderpriority, yr""",

    // fully spelled-out equivalent of the GROUP BY ALL / ORDER BY ALL
    // / lateral-alias sugar: sugar must not change semantics
    "q126_sql_sugar" -> """
      WITH per AS (
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
          COUNT(*) AS n_orders,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, yr)
      SELECT n_name, yr, n_orders,
        CAST(revenue AS DOUBLE) AS revenue_usd,
        CAST(revenue AS DOUBLE) * 2 AS revenue_x2,
        CAST(revenue AS DOUBLE) * 2 - CAST(revenue AS DOUBLE)
          AS revenue_back
      FROM per
      ORDER BY 1, 2, 3, 4, 5, 6""",

    // the SQL UDF body inlined by hand
    "q127_sql_scalar_udf" -> """
      SELECT l_returnflag,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
          AS DOUBLE) AS net_revenue,
        COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // the table-UDF bin generator expanded as a CTE
    "q128_sql_table_udf" -> """
      WITH b AS (
        SELECT CAST(i AS INTEGER) AS bin, i * 50000.0 AS lo,
          (i + 1) * 50000.0 AS hi
        FROM generate_series(0, 11) t(i))
      SELECT b.bin, CAST(b.lo AS BIGINT) AS lo_usd,
        COUNT(o_orderkey) AS n_orders
      FROM b LEFT JOIN orders
        ON o_totalprice >= b.lo AND o_totalprice < b.hi
      GROUP BY b.bin, b.lo
      ORDER BY b.bin""",

    // named parameters bound to the same literals
    "q130_param_sql" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      WHERE o_orderstatus = 'F'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // same Morton arithmetic spelled out per bit; ROW_NUMBER is safe
    // because the (z, p_partkey) order key is unique
    "q131_zorder_layout" -> """
      WITH base AS (
        SELECT p_partkey, CAST(p_size AS INTEGER) AS x,
          LEAST(CAST(FLOOR((p_retailprice - 900) / 2) AS INTEGER), 63)
            AS y
        FROM part),
      zv AS (
        SELECT p_partkey, x, y,
          (((x >> 0) & 1) << 0) + (((y >> 0) & 1) << 1) +
          (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3) +
          (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5) +
          (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) +
          (((x >> 4) & 1) << 8) + (((y >> 4) & 1) << 9) +
          (((x >> 5) & 1) << 10) + (((y >> 5) & 1) << 11) AS z
        FROM base),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY z, p_partkey) AS rk
        FROM zv)
      SELECT CAST((rk - 1) // 64 AS INTEGER) AS file_id,
        COUNT(*) AS n_parts,
        MIN(x) AS min_size, MAX(x) AS max_size,
        MIN(y) AS min_priceb, MAX(y) AS max_priceb,
        MIN(z) AS min_z, MAX(z) AS max_z
      FROM ranked
      GROUP BY 1
      ORDER BY 1""",

    // plain join: bloom false positives must all be removed by the
    // real join, so the prefiltered plan is value-identical to this
    "q132_bloom_prefilter" -> """
      SELECT s_nationkey, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 5
      GROUP BY s_nationkey
      ORDER BY s_nationkey""",

    // the originating rows: byte counts + digests must survive the
    // file write → binaryFile read cycle (strlen = UTF-8 bytes, the
    // same bytes Spark writes; DuckDB md5 hashes those bytes)
    "q133_binary_ingest" -> """
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        md5(text) AS content_md5
      FROM documents
      WHERE doc_id % 20 = 0
      ORDER BY doc_id""",

    // the connector's deterministic table recomputed in SQL
    "q134_custom_source" -> """
      WITH src AS (
        SELECT i AS id, CAST(i % 16 AS INTEGER) AS bucket,
          md5(CAST(i AS VARCHAR)) AS fp
        FROM range(0, 5000) t(i)
        WHERE i >= 1000 AND i < 4000)
      SELECT bucket, COUNT(*) AS n_rows,
        MIN(fp) AS min_fp, MAX(fp) AS max_fp
      FROM src
      GROUP BY bucket
      ORDER BY bucket""",

    // the batch GROUP BY the cross-batch named state must converge to
    "q135_transform_with_state" -> """
      SELECT user_id, COUNT(*) AS n_events,
        MAX(event_id) AS max_event_id
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    // append mode emits exactly the windows the final watermark
    // (global max event time - 10 min) has passed: end <= watermark
    "q136_stream_append_windows" -> """
      WITH wm AS (
        SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE AS w
        FROM events)
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events, wm
      WHERE time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
              + INTERVAL 5 MINUTE <= w
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // defaults recomputed explicitly: partial INSERT fills both,
    // VALUES(..., DEFAULT, 5) fills only status
    "q137_default_columns" -> """
      SELECT n_nationkey AS id, 'new' AS status, 10 AS score
      FROM nation
      UNION ALL SELECT 1000, 'new', 5
      ORDER BY id""",

    // by-name union with a nulled missing column, repaired downstream
    "q138_union_by_name" -> """
      SELECT COALESCE(CASE WHEN year(o_orderdate) >= 1995
               THEN o_orderpriority END, 'LEGACY') AS priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY 1
      ORDER BY 1""",

    // batch twin of the per-micro-batch broadcast enrichment
    "q139_stream_static_enrich" -> """
      SELECT n_name, event_type, COUNT(*) AS n_events
      FROM events JOIN nation ON user_id % 25 = n_nationkey
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // the stubs have closed forms on byte counts: resize = ceil(n/2),
    // frames = min(64, ceil(n / 4096)); payload bytes = strlen(text)
    "q140_media_transform" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CAST(strlen(text) AS INTEGER) AS n_bytes,
        CAST((strlen(text) + 1) // 2 AS INTEGER) AS resized_bytes,
        CAST(LEAST(64, CASE WHEN strlen(text) = 0 THEN 0
          ELSE (strlen(text) - 1) // 4096 + 1 END) AS INTEGER)
          AS n_frames_sampled
      FROM documents
      ORDER BY doc_id""",

    // q69's component labels, applied: drop non-canonical members,
    // roll the surviving corpus up per language
    "q141_kept_corpus" -> """
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      dropped AS (SELECT id AS doc_id FROM labels WHERE id <> label)
      SELECT d.lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END)
          AS BIGINT) AS n_dropped,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN d.n_chars ELSE 0 END)
          AS BIGINT) AS kept_chars
      FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
      GROUP BY d.lang
      ORDER BY d.lang""",

    // same tokenization as q34's whitespace side; uniform target share
    "q142_data_mixture" -> """
      WITH perlang AS (
        SELECT lang,
          CAST(SUM(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '))) AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang),
      g AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS grand,
              COUNT(*) AS n_langs FROM perlang)
      SELECT lang, total_tokens,
        ROUND(CAST(grand AS DOUBLE) / n_langs, 3) AS target_tokens,
        ROUND(LEAST(1.0, (CAST(grand AS DOUBLE) / n_langs)
          / CAST(total_tokens AS DOUBLE)), 9) AS sample_rate
      FROM perlang, g
      ORDER BY lang""",

    // the V2 write path must be value-transparent: aggregate on the
    // read-back table == aggregate on the source rows
    "q143_writer_v2" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // same float→double widening, same floor(x/scale + 0.5) rule;
    // the error term recomputes the code inline (identical value)
    "q144_embed_quantize" -> """
      WITH xs AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
        FROM embeddings),
      s AS (
        SELECT vec_id, xs,
          list_aggregate(list_transform(xs, x -> abs(x)), 'max') / 127.0
            AS scale
        FROM xs)
      SELECT vec_id,
        CAST(len(xs) AS INTEGER) AS dim,
        ROUND(scale, 9) AS scale,
        CAST(list_aggregate(list_transform(xs,
          x -> CAST(floor(x / scale + 0.5) AS BIGINT)), 'sum')
          AS BIGINT) AS q_sum,
        ROUND(list_aggregate(list_transform(xs,
          x -> abs(x - CAST(CAST(floor(x / scale + 0.5) AS BIGINT)
            AS DOUBLE) * scale)), 'max'), 9) AS max_abs_err
      FROM s
      ORDER BY vec_id""",

    // per-term log-probs rounded to 9 decimals then summed as exact
    // decimals — order-independent despite floating-point ln
    "q145_unigram_lm" -> """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      n AS (SELECT COUNT(*) AS n_total FROM w2),
      probs AS (
        SELECT word,
          CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
            / CAST(n_total AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp
        FROM w2 CROSS JOIN n
        GROUP BY word, n_total)
      SELECT doc_id, COUNT(*) AS n_tokens,
        ROUND(CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_logprob
      FROM w2 JOIN probs USING (word)
      WHERE doc_id < 30
      GROUP BY doc_id
      ORDER BY doc_id""",

    // arg_max/arg_min over the same unique composite key
    "q146_argmax" -> """
      SELECT n_name,
        arg_max(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
          * 10000000 + c_custkey) AS richest,
        MAX(c_acctbal) AS max_bal,
        arg_min(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
          * 10000000 + c_custkey) AS poorest,
        MIN(c_acctbal) AS min_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    // the bitmap pipeline must be lossless: plain exact distinct
    "q147_bitmap_distinct" -> """
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_orders,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // the inferred DDL is pinned as a literal; sums via json extract
    "q148_json_infer" -> """
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
          AS BIGINT) AS sum_k,
        'STRUCT<k: BIGINT>' AS inferred_schema
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    "q150_pagerank" -> q150PageRankOracle,

    // identical operator grouping and per-term 9-decimal rounding,
    // summed as exact decimals (order-independent)
    "q151_bm25" -> (bm25Ctes + """
      SELECT doc_id, bm25, n_terms_hit FROM lexs
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""),

    // the WHILE loop's fixpoint derived set-based: smallest 50k step
    // leaving <= 1000 orders above it
    "q152_sql_scripting" -> """
      WITH steps AS (
        SELECT (i + 1) * 50000.0 AS thr FROM generate_series(0, 19) t(i)),
      counted AS (
        SELECT thr,
          (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr) AS cnt
        FROM steps),
      pick AS (
        SELECT thr, cnt FROM counted WHERE cnt <= 1000
        ORDER BY thr LIMIT 1)
      SELECT CAST(thr AS BIGINT) AS threshold, cnt AS n_above,
        (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM orders, pick WHERE o_totalprice > pick.thr)
          AS revenue_above
      FROM pick""",

    // the dynamic statement with its bind applied literally
    "q153_exec_immediate" -> """
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
      FROM part WHERE p_size >= 25
      GROUP BY p_brand
      ORDER BY p_brand""",

    // same half-open version intervals over the same ordering
    "q154_point_in_time" -> """
      WITH dim AS (
        SELECT user_id AS d_user, CAST(ts AS TIMESTAMP) AS valid_from,
          lead(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
          event_type AS status
        FROM events
        WHERE user_id < 30 AND event_type <> 'purchase'),
      f AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events
        WHERE user_id < 30 AND event_type = 'purchase')
      SELECT status, COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM f JOIN dim ON f.user_id = dim.d_user
        AND dim.valid_from <= f.ts
        AND (dim.valid_to IS NULL OR f.ts < dim.valid_to)
      GROUP BY status
      ORDER BY status""",

    // portable modular weekday from a fixed Monday epoch
    "q155_time_features" -> """
      WITH f AS (
        SELECT event_type,
          CAST((((CAST(ts AS DATE) - DATE '2024-01-01') % 7) + 7) % 7
            AS INTEGER) AS dow,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
          CAST(quarter(CAST(ts AS TIMESTAMP)) AS INTEGER) AS qtr
        FROM events)
      SELECT event_type, dow, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN dow >= 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_weekend,
        CAST(SUM(CASE WHEN hr >= 9 AND hr < 17 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_bizhours,
        MIN(hr) AS min_hr, MAX(hr) AS max_hr, MIN(qtr) AS min_qtr
      FROM f
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // same regex segmentation over the same normalized text
    "q156_sentence_stats" -> """
      WITH sents AS (
        SELECT doc_id, lang, trim(s) AS sent
        FROM (
          SELECT doc_id, lang,
            unnest(string_split_regex(trim(regexp_replace(lower(text),
              '\s+', ' ', 'g')), '[.!?]+')) AS s
          FROM documents) u
        WHERE trim(s) <> ''),
      w AS (
        SELECT doc_id, lang, len(string_split(sent, ' ')) AS sent_words
        FROM sents)
      SELECT lang, COUNT(DISTINCT doc_id) AS n_docs,
        COUNT(*) AS total_sents,
        CAST(SUM(sent_words) AS BIGINT) AS total_sent_words,
        CAST(MIN(sent_words) AS INTEGER) AS min_sent_words,
        CAST(MAX(sent_words) AS INTEGER) AS max_sent_words
      FROM w
      GROUP BY lang
      ORDER BY lang""",

    // same md5-prefix bucket arithmetic ('0x' cast parses hex)
    "q157_feature_hashing" -> """
      WITH f AS (
        SELECT doc_id, lang || '|' || source AS feat FROM documents)
      SELECT CAST(CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 64
          AS INTEGER) AS bucket,
        COUNT(*) AS n_docs,
        COUNT(DISTINCT feat) AS n_distinct_feats,
        MIN(feat) AS first_feat
      FROM f
      GROUP BY 1
      ORDER BY 1""",

    // same banded pairs + the q55 md5 split, leakage = cross-split
    "q158_split_leakage" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sp AS (
        SELECT doc_a, doc_b,
          CASE WHEN md5(CAST(doc_a AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_a AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split_a,
          CASE WHEN md5(CAST(doc_b AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_b AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split_b
        FROM pairs)
      SELECT split_a, split_b, COUNT(*) AS n_pairs,
        CAST(SUM(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END)
          AS BIGINT) AS n_leaks,
        MIN(doc_a) AS example_doc_a
      FROM sp
      GROUP BY split_a, split_b
      ORDER BY split_a, split_b""",

    // identical sequential-fold norms, rounded then decimal-summed
    "q159_label_stats" -> """
      WITH n AS (
        SELECT label,
          CAST(ROUND(sqrt(list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE)
                 * CAST(embedding[i] AS DOUBLE)),
            (x, y) -> x + y)), 9) AS DECIMAL(18,9)) AS nrm
        FROM embeddings)
      SELECT label, COUNT(*) AS n_vecs,
        ROUND(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 9) AS avg_norm,
        CAST(MIN(nrm) AS DOUBLE) AS min_norm,
        CAST(MAX(nrm) AS DOUBLE) AS max_norm
      FROM n
      GROUP BY label
      ORDER BY label""",

    // same exact power sums, same double conversion order
    "q160_outliers" -> """
      WITH o AS (
        SELECT o_orderpriority AS pri,
          CAST(o_totalprice AS DOUBLE) AS x,
          CAST(o_totalprice AS DECIMAL(18,2)) AS xd
        FROM orders),
      st AS (
        SELECT pri, COUNT(*) AS n,
          CAST(SUM(xd) AS DOUBLE) AS s1d,
          CAST(SUM(xd * xd) AS DOUBLE) AS s2d
        FROM o GROUP BY pri),
      m AS (
        SELECT pri, n, s1d / n AS mean,
          sqrt(GREATEST((s2d - s1d * s1d / n) / n, 0.0)) AS sd
        FROM st)
      SELECT o.pri, MAX(m.n) AS n_orders,
        ROUND(MAX(m.mean), 6) AS mean_price,
        ROUND(MAX(m.sd), 6) AS sd_price,
        CAST(SUM(CASE WHEN o.x > m.mean + 3.0 * m.sd
                       OR o.x < m.mean - 3.0 * m.sd
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM o JOIN m ON o.pri = m.pri
      GROUP BY o.pri
      ORDER BY o.pri""",

    // same top-16 vocab (freq desc, word asc tie-break), NOT IN probe
    "q161_oov_rate" -> """
      WITH w2 AS (
        SELECT lang, word FROM (
          SELECT lang,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      wc AS (SELECT lang, word, COUNT(*) AS n FROM w2 GROUP BY 1, 2),
      v AS (
        SELECT word FROM (
          SELECT word,
            ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, word ASC) AS rk
          FROM wc GROUP BY word) t
        WHERE rk <= 16),
      oov AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS oov_tokens
        FROM wc WHERE word NOT IN (SELECT word FROM v)
        GROUP BY lang),
      tot AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS total_tokens
        FROM wc GROUP BY lang)
      SELECT lang, total_tokens,
        COALESCE(oov_tokens, 0) AS oov_tokens,
        ROUND(CAST(COALESCE(oov_tokens, 0) AS DOUBLE)
          / CAST(total_tokens AS DOUBLE), 9) AS oov_rate
      FROM tot LEFT JOIN oov USING (lang)
      ORDER BY lang""",

    // same tokenization, same 2048 budget arithmetic
    "q162_truncation_loss" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        CAST(SUM(CASE WHEN n_tok > 2048 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_truncated_docs,
        CAST(SUM(GREATEST(n_tok - 2048, 0)) AS BIGINT) AS tokens_lost,
        ROUND(CAST(SUM(GREATEST(n_tok - 2048, 0)) AS DOUBLE)
          / CAST(SUM(n_tok) AS DOUBLE), 9) AS loss_rate
      FROM (
        SELECT lang,
          len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS n_tok
        FROM documents) t
      GROUP BY lang
      ORDER BY lang""",

    // same md5-uniform draw against the same per-row keep curve
    "q163_weighted_sample" -> """
      WITH d AS (
        SELECT lang,
          CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) AS DOUBLE) / 4294967296.0 AS u,
          LEAST(1.0, CAST(n_chars AS DOUBLE) / 2000.0) AS p
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        ROUND(CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 9) AS keep_rate,
        ROUND(CAST(SUM(CAST(ROUND(p, 9) AS DECIMAL(18,9))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 9) AS expected_rate
      FROM d
      GROUP BY lang
      ORDER BY lang""",

    // same simulated v2 (drop %7, amend %10, append shifted ids)
    "q164_corpus_diff" -> """
      WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
      v2 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0
               THEN md5(text || ' [amended v2]')
               ELSE md5(text) END AS h2
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 1000000, md5('new:' || text)
        FROM documents WHERE doc_id < 100)
      SELECT CASE WHEN h1 IS NULL THEN 'added'
                  WHEN h2 IS NULL THEN 'removed'
                  WHEN h1 = h2 THEN 'unchanged'
                  ELSE 'changed' END AS change,
        COUNT(*) AS n_docs
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      GROUP BY 1
      ORDER BY 1""",

    // single data batch: update mode emits each window exactly once
    "q165_stream_update_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // boolean folds are associative: FILTER-style aggregates mirror
    "q166_bool_aggs" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_big,
        bool_and(o_totalprice > 0) AS all_positive,
        bool_or(o_orderstatus = 'F') AS any_finished,
        CAST(SUM(CAST(CASE WHEN o_totalprice > 150000
          THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE)
          AS big_revenue
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // same exact decimal power sums, same double formula on top
    "q167_skew_kurtosis" -> """
      WITH s AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(x) AS DOUBLE) AS s1,
          CAST(SUM(x*x) AS DOUBLE) AS s2,
          CAST(SUM(x*x*x) AS DOUBLE) AS s3,
          CAST(SUM(x*x*x*x) AS DOUBLE) AS s4
        FROM (SELECT l_returnflag,
                CAST(l_quantity AS DECIMAL(7,2)) AS x FROM lineitem)
        GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
          / POW(s2/n - (s1/n)*(s1/n), 1.5), 9) AS skew_qty,
        ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
          / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3, 9)
          AS kurt_qty
      FROM s
      ORDER BY l_returnflag""",

    // + INTERVAL 1 MONTH clamps end-of-month exactly like add_months
    "q168_date_arith" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                 AS month_start,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
        n_orders,
        strftime(last_day(month_start), '%Y-%m-%d') AS month_end,
        strftime(CAST(month_start + INTERVAL 1 MONTH AS DATE),
          '%Y-%m-%d') AS next_month_start,
        CAST(isodow(month_start) AS INT) AS isodow_start,
        CAST(date_diff('day', month_start,
          CAST(month_start + INTERVAL 1 MONTH AS DATE)) AS INT)
          AS days_in_month
      FROM m
      ORDER BY month_start""",

    // md5 → unhex → base64 is byte-identical across engines
    "q169_binary_encode" -> """
      WITH g AS (
        SELECT lang, COUNT(*) AS n_docs, MIN(md5(text)) AS min_hex
        FROM documents GROUP BY lang)
      SELECT lang, n_docs, min_hex,
        CAST(length(min_hex) AS INT) AS hex_len,
        CAST(octet_length(unhex(min_hex)) AS INT) AS raw_len,
        base64(unhex(min_hex)) AS digest_b64
      FROM g
      ORDER BY lang""",

    // printf mirrors format_string; overlay spelled as substr splice
    "q170_string_toolkit" -> """
      WITH g AS (
        SELECT event_type, COUNT(*) AS n_events
        FROM events GROUP BY event_type)
      SELECT event_type, n_events,
        printf('%s:%06d', event_type, n_events) AS tag,
        substr(event_type, 1, 1) || 'XX' || substr(event_type, 4)
          AS spliced,
        lpad(upper(event_type), 10, '*') AS padded,
        translate(event_type, 'aeiou', 'AEIOU') AS devoweled,
        reverse(event_type) AS reversed
      FROM g
      ORDER BY event_type""",

    // composite (balance, key) order: ties cannot reorder the frame
    "q171_window_dist" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal,
        ROUND(cume_dist() OVER
          (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey), 9) AS cd,
        nth_value(c_name, 3) OVER
          (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS third_poorest
      FROM customer
      ORDER BY c_mktsegment, c_custkey""",

    // plain join: the salted formulation must be salt-invariant
    "q80_salted_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // the nested-SELECT form the pipe syntax de-sugars to
    "q172_sql_pipe" -> """
      SELECT o_orderpriority, o_orderstatus, n_orders, revenue,
        CAST(round(revenue / n_orders, 2) AS DOUBLE) AS avg_order
      FROM (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM orders
        WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority, o_orderstatus)
      WHERE n_orders >= 5
      ORDER BY o_orderpriority, o_orderstatus""",

    // literal patterns: strpos ≡ regexp_instr, NULLIF aligns DuckDB's
    // empty-string no-match with Spark's NULL
    "q173_regexp_toolkit" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text, '\btable\b')))
          AS BIGINT) AS table_mentions,
        CAST(SUM(CASE WHEN regexp_matches(text, '\bspark\b')
          THEN 1 ELSE 0 END) AS BIGINT) AS spark_docs,
        CAST(SUM(strpos(text, 'spark')) AS BIGINT) AS spark_pos_sum,
        CAST(SUM(len(regexp_extract_all(text, '[a-z]+')))
          AS BIGINT) AS n_words,
        MIN(NULLIF(regexp_extract(text, '\bs[a-z]+'), ''))
          AS first_s_word
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // quantile_disc/cont share Spark's cume_dist / (n-1)·p definitions
    "q174_quantile_family" -> """
      SELECT l_returnflag, COUNT(*) AS n_rows,
        ROUND(median(CAST(l_quantity AS DOUBLE)), 9) AS median_qty,
        ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 9)
          AS q25_cont,
        quantile_disc(CAST(l_quantity AS DOUBLE), 0.25) AS q25_disc,
        quantile_disc(CAST(l_quantity AS DOUBLE), 0.75) AS q75_disc
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // same EXISTS / NOT EXISTS / NULL-poisoned NOT IN semantics
    "q175_exists_subquery" -> """
      WITH with_orders AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment),
      without_orders AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment),
      notin_nullset AS (
        SELECT COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders
           UNION ALL SELECT CAST(NULL AS BIGINT)))
      SELECT w.c_mktsegment, w.n AS n_with_orders,
        COALESCE(wo.n, 0) AS n_without_orders,
        (SELECT n FROM notin_nullset) AS n_notin_nullset
      FROM with_orders w
      LEFT JOIN without_orders wo ON w.c_mktsegment = wo.c_mktsegment
      ORDER BY w.c_mktsegment""",

    // re-derive host/path/query from the raw columns: the hash proves
    // parse_url against ground truth, not against another parser
    "q176_url_parse" -> """
      WITH u AS (
        SELECT source || '.example.com' AS host,
          '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
          split_part(text, ' ', 1) AS first_word
        FROM documents)
      SELECT host, COUNT(*) AS n_docs,
        COUNT(DISTINCT path) AS n_paths,
        MIN(path) AS min_path,
        COUNT(DISTINCT first_word) AS n_first_words
      FROM u
      GROUP BY host
      ORDER BY host""",

    // ANSI GROUPING(a, b) bitmask = Spark's grouping_id()
    "q177_grouping_id" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority""",

    // identical sorted-list sequential fold: list_reduce seeds with
    // the first element, Spark's aggregate with 0.0 — equal bitwise
    "q178_char_entropy" -> """
      WITH freq AS (
        SELECT doc_id, lang, ch, COUNT(*) AS cnt
        FROM (SELECT doc_id, lang,
                unnest(regexp_extract_all(text, '.')) AS ch
              FROM documents)
        GROUP BY doc_id, lang, ch),
      agg AS (
        SELECT doc_id, lang, CAST(SUM(cnt) AS BIGINT) AS n_chars,
          COUNT(*) AS distinct_chars, list_sort(list(cnt)) AS cnts
        FROM freq GROUP BY doc_id, lang)
      SELECT doc_id, lang, n_chars, distinct_chars,
        ROUND(log2(CAST(n_chars AS DOUBLE)) -
          list_reduce(list_transform(cnts, c ->
            CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))),
            (a, b) -> a + b) / CAST(n_chars AS DOUBLE), 9) AS entropy
      FROM agg
      ORDER BY doc_id""",

    // generate_series(1, 0) is empty here; the length guard matches
    // Spark's, where argless sequence(1, 0) would step downward
    "q179_bpe_pairs" -> """
      WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
          i -> substr(w, CAST(i AS INT), 2))) AS pair
        FROM words WHERE length(w) >= 2)
      SELECT pair, COUNT(*) AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 20""",

    // same doc_id-derived injection, then the same regex battery;
    // NULLIF aligns DuckDB's '' no-match with Spark's NULL
    "q180_pii_scan" -> """
      WITH t AS (
        SELECT source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE text END AS t
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN regexp_matches(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END)
          AS BIGINT) AS docs_with_email,
        CAST(SUM(len(regexp_extract_all(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT) AS n_emails,
        CAST(SUM(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')))
          AS BIGINT) AS n_phones,
        MIN(NULLIF(regexp_extract(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'), '')) AS sample_email
      FROM t GROUP BY source ORDER BY source""",

    // centroid means rounded to 9 before scoring on both sides, then
    // identical sequential folds — the rank boundary is exact
    "q181_embed_centroid" -> """
      WITH pos AS (
        SELECT label, CAST(s.pos AS INT) AS pos, s.x AS x FROM (
          SELECT label, unnest(list_transform(range(1, 65), i ->
            {'pos': i,
             'x': CAST(embedding[CAST(i AS INT)] AS DOUBLE)})) AS s
          FROM embeddings)),
      cent AS (
        SELECT label, list(m ORDER BY pos) AS c
        FROM (SELECT label, pos, ROUND(AVG(x), 9) AS m
              FROM pos GROUP BY label, pos)
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label,
          list_reduce(list_transform(list_zip(e.embedding, c.c), s ->
            CAST(s[1] AS DOUBLE) * s[2]), (a, b) -> a + b) AS dotp,
          sqrt(list_reduce(list_transform(e.embedding, x ->
            CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
            AS nv,
          sqrt(list_reduce(list_transform(c.c, y -> y * y),
            (a, b) -> a + b)) AS nc
        FROM embeddings e JOIN cent c USING (label)),
      ranked AS (
        SELECT label, vec_id, ROUND(dotp / (nv * nc), 9) AS cos_centroid,
          row_number() OVER (PARTITION BY label
            ORDER BY dotp / (nv * nc), vec_id) AS rn
        FROM scored)
      SELECT label, vec_id, cos_centroid, CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= 3
      ORDER BY label, rn""",

    // the CTE expanded twice — reuse must not change the numbers
    "q182_reused_exchange" -> """
      WITH t AS (
        SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total
        FROM orders GROUP BY o_orderpriority)
      SELECT t.priority, t.n_orders, t.total,
        CAST(round(t.total / m.max_total, 9) AS DOUBLE) AS share_of_max,
        m.max_orders
      FROM t CROSS JOIN (SELECT MAX(total) AS max_total,
        MAX(n_orders) AS max_orders FROM t) m
      ORDER BY t.priority""",

    // all interval matches + non-matching clicks whose join window
    // closed strictly before the drain's final watermark (min of the
    // two sides' max event time, minus the 30-minute delay)
    "q184_stream_outer_join" -> """
      WITH c AS (
        SELECT event_id AS click_id, user_id,
          CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT event_id AS buy_id, user_id AS p_user,
          CAST(ts AS TIMESTAMP) AS buy_ts
        FROM events WHERE event_type = 'purchase'),
      wm AS (
        SELECT least(
          (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
            WHERE event_type = 'click'),
          (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
            WHERE event_type = 'purchase')) - INTERVAL 30 MINUTE AS w),
      matched AS (
        SELECT c.click_id, c.user_id, c.click_ts, p.buy_id, p.buy_ts
        FROM c JOIN p ON c.user_id = p.p_user
          AND p.buy_ts >= c.click_ts
          AND p.buy_ts <= c.click_ts + INTERVAL 10 MINUTE),
      unmatched AS (
        SELECT c.click_id, c.user_id, c.click_ts,
          CAST(NULL AS BIGINT) AS buy_id,
          CAST(NULL AS TIMESTAMP) AS buy_ts
        FROM c
        WHERE NOT EXISTS (SELECT 1 FROM p
            WHERE p.p_user = c.user_id AND p.buy_ts >= c.click_ts
              AND p.buy_ts <= c.click_ts + INTERVAL 10 MINUTE)
          AND c.click_ts + INTERVAL 10 MINUTE < (SELECT w FROM wm))
      SELECT * FROM matched
      UNION ALL SELECT * FROM unmatched
      ORDER BY click_id, buy_id""",

    // the theta join the banded equi-join must reproduce exactly
    "q185_interval_overlap" -> """
      WITH c AS (
        SELECT user_id, event_id AS click_id,
          CAST(ts AS TIMESTAMP) AS c_start,
          CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS c_end
        FROM events WHERE event_type = 'click'),
      v AS (
        SELECT user_id AS v_user, event_id AS view_id,
          CAST(ts AS TIMESTAMP) AS v_start,
          CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS v_end
        FROM events WHERE event_type = 'view'),
      pairs AS (
        SELECT c.user_id, c.click_id, v.view_id
        FROM c JOIN v ON c.user_id = v.v_user
          AND c.c_start <= v.v_end AND v.v_start <= c.c_end)
      SELECT user_id, COUNT(*) AS n_overlaps,
        MIN(click_id) AS min_click, MAX(view_id) AS max_view
      FROM pairs GROUP BY user_id
      ORDER BY user_id""",

    // the contract diff is a fixed metadata fact — literal oracle
    "q186_schema_contract" -> """
      SELECT * FROM (VALUES
        ('doc_id',  'bigint', 'bigint', 'ok'),
        ('lang',    'string', 'string', 'ok'),
        ('n_chars', 'bigint', 'int',    'type_mismatch'),
        ('quality', 'double', NULL,     'missing'),
        ('source',  'string', NULL,     'missing'),
        ('src',     NULL,     'string', 'unexpected'),
        ('text',    'string', 'string', 'ok'))
        AS t(field, expected, actual, status)
      ORDER BY field""",

    // same spine, same deliberate June-1995 hole
    "q187_partition_audit" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
          COUNT(*) AS n
        FROM orders GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series((SELECT MIN(mo) FROM m),
          (SELECT MAX(mo) FROM m), INTERVAL 1 MONTH)) AS mo)
      SELECT strftime(CAST(s.mo AS DATE), '%Y-%m-%d') AS o_month,
        CASE WHEN m.mo IS NULL OR s.mo = DATE '1995-06-01'
          THEN 'missing' ELSE 'present' END AS status,
        CAST(CASE WHEN m.mo IS NULL OR s.mo = DATE '1995-06-01'
          THEN 0 ELSE m.n END AS BIGINT) AS n_rows
      FROM spine s LEFT JOIN m ON CAST(s.mo AS DATE) = m.mo
      ORDER BY o_month""",

    // ANSI ntile: the first (n mod 10) deciles take the extra row
    "q188_equidepth_hist" -> """
      WITH d AS (
        SELECT o_totalprice,
          ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders)
      SELECT decile, COUNT(*) AS n_orders,
        MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total
      FROM d GROUP BY decile
      ORDER BY decile""",

    // bag intersection with multiplicity min(n_high, n_low)
    "q189_intersect_all" -> """
      WITH h AS (SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity > 25),
      l AS (SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity <= 25),
      i AS (SELECT * FROM h INTERSECT ALL SELECT * FROM l)
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_common
      FROM i GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // identical ANSI FILTER clause on both engines
    "q190_filter_clause" -> """
      SELECT o_orderstatus, COUNT(*) AS n_total,
        COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
          AS urgent_total,
        MIN(o_orderdate) FILTER (WHERE o_orderpriority = '1-URGENT')
          AS first_urgent
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // logs rounded to 9 decimals then EXACT decimal power sums —
    // order-free on both engines, no float fold anywhere
    "q191_zipf_fit" -> """
      WITH tok AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS tok
        FROM documents),
      f AS (SELECT tok, COUNT(*) AS freq FROM tok GROUP BY tok
        ORDER BY freq DESC, tok LIMIT 1000),
      r AS (SELECT freq,
        row_number() OVER (ORDER BY freq DESC, tok) AS rank FROM f),
      d AS (SELECT
        CAST(ROUND(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
        CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly
        FROM r),
      s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
        CAST(SUM(lx * lx) AS DOUBLE) AS sxx,
        CAST(SUM(lx * ly) AS DOUBLE) AS sxy,
        CAST(SUM(ly * ly) AS DOUBLE) AS syy FROM d)
      SELECT CAST(n AS BIGINT) AS n_tokens,
        ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) AS zipf_slope,
        ROUND((sy - sx * ((n*sxy - sx*sy) / (n*sxx - sx*sx))) / n, 9)
          AS intercept,
        ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
          ((n*sxx - sx*sx) * (n*syy - sy*sy)), 9) AS r2
      FROM s""",

    // quantile_disc shares Spark's percentile_disc definition, so the
    // cut points are identical actual data values
    "q192_winsorize" -> """
      WITH cuts AS (SELECT
        quantile_disc(o_totalprice, 0.05) AS lo,
        quantile_disc(o_totalprice, 0.95) AS hi FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END)
          AS BIGINT) AS n_floor,
        CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ceil,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS raw_total,
        CAST(SUM(CAST(least(greatest(o_totalprice, lo), hi)
          AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_total
      FROM orders, cuts
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // same first-failed-gate attribution, same gate order
    "q193_filter_waterfall" -> """
      WITH t AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ') AS w,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents),
      g AS (
        SELECT CASE
          WHEN NOT (len(w) BETWEEN 20 AND 100000) THEN 1
          WHEN NOT ((CAST(length(replace(norm, ' ', '')) AS DOUBLE)
            / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0) THEN 2
          WHEN len(list_filter(w, x -> list_contains(
            ['the', 'a', 'of', 'to', 'and'], x))) < 1 THEN 3
          WHEN CAST(len(list_filter(w, x ->
            regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
            / CAST(len(w) AS DOUBLE) < 0.5 THEN 4
          ELSE 0 END AS ff
        FROM t),
      a AS (SELECT COUNT(*) AS total,
        CAST(SUM(CASE WHEN ff = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN ff = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(SUM(CASE WHEN ff = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        CAST(SUM(CASE WHEN ff = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
        FROM g)
      SELECT 1 AS stage, 'length' AS gate, total AS n_entering,
        d1 AS n_dropped, total - d1 AS n_surviving FROM a
      UNION ALL SELECT 2, 'mean_word_len', total - d1, d2,
        total - d1 - d2 FROM a
      UNION ALL SELECT 3, 'stopwords', total - d1 - d2, d3,
        total - d1 - d2 - d3 FROM a
      UNION ALL SELECT 4, 'alpha_frac', total - d1 - d2 - d3, d4,
        total - d1 - d2 - d3 - d4 FROM a
      ORDER BY stage""",

    // same deny list, same (n_chars desc, doc_id) cap rank
    "q194_domain_policy" -> """
      WITH d AS (
        SELECT source || '.example.com' AS host, doc_id, n_chars
        FROM documents WHERE source NOT IN ('src3', 'src7')),
      r AS (SELECT host, n_chars, row_number() OVER
          (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rnk
        FROM d)
      SELECT host, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN rnk > 15 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_capped,
        CAST(SUM(CASE WHEN rnk <= 15 THEN n_chars ELSE 0 END)
          AS BIGINT) AS kept_chars
      FROM r GROUP BY host
      ORDER BY host""",

    // closed form over the same residue classes the source computes
    "q195_source_agg_pushdown" -> """
      SELECT CAST(i % 16 AS INT) AS bucket, COUNT(*) AS n_rows,
        CAST(SUM(i) AS BIGINT) AS id_sum,
        MIN(i) AS id_min, MAX(i) AS id_max
      FROM range(100000, 1000000) t(i)
      GROUP BY 1
      ORDER BY 1""",

    // the JDBC cycle must be lossless: oracle on the original parquet
    "q196_jdbc_roundtrip" -> """
      SELECT s_nationkey, COUNT(*) AS n_suppliers,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal,
        MIN(s_name) AS first_name
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey""",

    // recovery must be invisible: two checkpointed incarnations emit
    // exactly the single-run append-mode window set (q136's oracle)
    "q197_stream_recovery" -> """
      WITH wm AS (
        SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE AS w
        FROM events)
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events, wm
      WHERE time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
              + INTERVAL 5 MINUTE <= w
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // corpus-vs-itself 8-gram duplication ratio per document
    "q198_dup_gram_profile" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      grams AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM d8),
      gdf AS (SELECT gram, COUNT(*) AS n_df FROM grams GROUP BY gram)
      SELECT g.doc_id,
        COUNT(*) AS n_grams,
        CAST(SUM(CASE WHEN gdf.n_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_grams,
        ROUND(CAST(SUM(CASE WHEN gdf.n_df >= 2 THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS dup_ratio
      FROM grams g JOIN gdf USING (gram)
      GROUP BY g.doc_id
      ORDER BY g.doc_id""",

    // the md5 permutation is engine-portable, so the oracle re-derives
    // the full training order and the ranks must agree exactly
    "q199_shuffle_order" -> """
      SELECT CAST(ROW_NUMBER() OVER (
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
          AS rank,
        doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
      ORDER BY rank""",

    // integer token math until the final ratio
    "q200_length_buckets" -> """
      WITH t AS (
        SELECT CAST(len(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        FROM documents)
      SELECT LEAST(n_tokens // 64, 7) AS bucket,
        COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        MAX(n_tokens) AS max_tokens,
        ROUND(CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS DOUBLE)
          / CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE), 9)
          AS pad_waste_ratio
      FROM t
      GROUP BY 1
      ORDER BY 1""",

    // sparse tf-idf cosine over bigram-shingle features: candidates
    // from the rare-term index, per-term contributions rounded then
    // decimal-summed
    "q201_sparse_cosine" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      trm AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS term
        FROM wrd WHERE len(w) >= 2),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf
             FROM trm GROUP BY doc_id, term),
      dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n_total FROM documents),
      wtf AS (
        SELECT doc_id, term,
          ROUND(CAST(tf AS DOUBLE)
            * ln(CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE)), 9) AS wt
        FROM tf JOIN dfr USING (term) CROSS JOIN n),
      norms AS (
        SELECT doc_id,
          sqrt(CAST(SUM(CAST(ROUND(wt * wt, 9) AS DECIMAL(28,9)))
            AS DOUBLE)) AS norm
        FROM wtf GROUP BY doc_id),
      ix AS (
        SELECT term, doc_id FROM tf
        JOIN (SELECT term FROM dfr WHERE df <= 20) r USING (term)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ix a JOIN ix b
          ON a.term = b.term AND a.doc_id < b.doc_id),
      dots AS (
        SELECT doc_a, doc_b,
          CAST(SUM(CAST(ROUND(wa.wt * wb.wt, 9) AS DECIMAL(28,9)))
            AS DOUBLE) AS dotp
        FROM cand
        JOIN wtf wa ON wa.doc_id = doc_a
        JOIN wtf wb ON wb.doc_id = doc_b AND wb.term = wa.term
        GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b,
        ROUND(dotp / (na.norm * nb.norm), 9) AS cosine
      FROM dots
      JOIN norms na ON na.doc_id = doc_a
      JOIN norms nb ON nb.doc_id = doc_b
      WHERE ROUND(dotp / (na.norm * nb.norm), 9) >= 0.5
      ORDER BY doc_a, doc_b""",

    // the declared CSV -> Spark -> DWH path must be lossless end to
    // end; oracle on the original parquet
    "q202_dwh_load" -> """
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_retail,
        MIN(p_type) AS min_type
      FROM part
      WHERE p_size IS NOT NULL
      GROUP BY p_brand
      ORDER BY p_brand""",

    // add-one bigram LM trained on the train split, held-out docs
    // scored by mean nll; parallel unnests zip into aligned bigrams
    "q203_bigram_ppl" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d2 AS (SELECT doc_id, w FROM wrd WHERE len(w) >= 2),
      bg AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
        FROM d2),
      train AS (SELECT * FROM bg WHERE doc_id % 10 <> 0),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
      v AS (SELECT COUNT(DISTINCT w2) AS v FROM train),
      held AS (SELECT * FROM bg WHERE doc_id % 10 = 0),
      scored AS (
        SELECT h.doc_id,
          CAST(ROUND(-ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)), 9)
            AS DECIMAL(28,9)) AS nll
        FROM held h
        LEFT JOIN c2 ON c2.w1 = h.w1 AND c2.w2 = h.w2
        LEFT JOIN c1 ON c1.w1 = h.w1
        CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_nll
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id""",

    // triangles over the MinHash-verified near-dup pairs: the same
    // pair CTEs as q125, then the a<b<c two-join enumeration
    "q204_triangles" -> trianglesOracle,

    // q212 = q204 with the degree-ordered orientation — bit-identical
    // counts by construction, so the same oracle pins both
    "q212_triangles_degree" -> trianglesOracle,

    // the banded path's recall certificate: exact anchor pairs (q30's
    // all-pairs cosine) left-joined with the float-free sign-bucket
    // pairs — the recall column is hash-checked, not just floored
    "q213_banded_recall" -> """
      WITH bk AS (
        SELECT vec_id, CAST(t.tbl AS INTEGER) AS tbl,
          (CASE WHEN embedding[CAST(t.tbl * 4 + 1 AS INTEGER)] >= 0
                THEN 1 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 2 AS INTEGER)] >= 0
                THEN 2 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 3 AS INTEGER)] >= 0
                THEN 4 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 4 AS INTEGER)] >= 0
                THEN 8 ELSE 0 END) AS bucket
        FROM embeddings CROSS JOIN
          (SELECT unnest(range(4)) AS tbl) t),
      cand AS (
        SELECT DISTINCT ba.vec_id AS vec_a, bb.vec_id AS vec_b
        FROM bk ba JOIN bk bb
          ON ba.tbl = bb.tbl AND ba.bucket = bb.bucket
          AND ba.vec_id < bb.vec_id),
      banded AS (
        SELECT vec_a, vec_b FROM (
          SELECT vec_a, vec_b,
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            / sqrt(
              list_reduce(list_transform(range(1, 65),
                i -> CAST(a.embedding[i] AS DOUBLE)
                     * CAST(a.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)
              * list_reduce(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE)
                     * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)) AS cosine
          FROM cand
          JOIN embeddings a ON a.vec_id = vec_a
          JOIN embeddings b ON b.vec_id = vec_b) p
        WHERE cosine >= 0.45),
      anchor AS (
        SELECT vec_a, vec_b, cosine FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            / sqrt(
              list_reduce(list_transform(range(1, 65),
                i -> CAST(a.embedding[i] AS DOUBLE)
                     * CAST(a.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)
              * list_reduce(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE)
                     * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)) AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
        WHERE cosine >= 0.45)
      SELECT floor(an.cosine * 20) / 20 AS cos_bucket,
        COUNT(*) AS n_anchor_pairs,
        CAST(SUM(CASE WHEN h.vec_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_banded_pairs,
        ROUND(CAST(SUM(CASE WHEN h.vec_a IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 9) AS recall
      FROM anchor an LEFT JOIN banded h
        ON an.vec_a = h.vec_a AND an.vec_b = h.vec_b
      GROUP BY floor(an.cosine * 20) / 20
      ORDER BY cos_bucket""",

    // min-label components over the sign-LSH embedding pairs (the
    // q122 bucket CTEs + q69's recursive reach)
    "q205_embed_clusters" -> """
      WITH RECURSIVE bk AS (
        SELECT vec_id, CAST(t.tbl AS INTEGER) AS tbl,
          (CASE WHEN embedding[CAST(t.tbl * 4 + 1 AS INTEGER)] >= 0
                THEN 1 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 2 AS INTEGER)] >= 0
                THEN 2 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 3 AS INTEGER)] >= 0
                THEN 4 ELSE 0 END
         + CASE WHEN embedding[CAST(t.tbl * 4 + 4 AS INTEGER)] >= 0
                THEN 8 ELSE 0 END) AS bucket
        FROM embeddings CROSS JOIN
          (SELECT unnest(range(4)) AS tbl) t),
      cand AS (
        SELECT DISTINCT ba.vec_id AS vec_a, bb.vec_id AS vec_b
        FROM bk ba JOIN bk bb
          ON ba.tbl = bb.tbl AND ba.bucket = bb.bucket
          AND ba.vec_id < bb.vec_id),
      pairs AS (
        SELECT vec_a, vec_b FROM (
          SELECT vec_a, vec_b,
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            / sqrt(
              list_reduce(list_transform(range(1, 65),
                i -> CAST(a.embedding[i] AS DOUBLE)
                     * CAST(a.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)
              * list_reduce(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE)
                     * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y)) AS cosine
          FROM cand
          JOIN embeddings a ON a.vec_id = vec_a
          JOIN embeddings b ON b.vec_id = vec_b) p
        WHERE cosine >= 0.45),
      sym AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
              UNION SELECT vec_b, vec_a FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)
      SELECT label AS cluster, COUNT(*) AS n_vecs, MAX(id) AS max_vec
      FROM labels
      GROUP BY label
      ORDER BY cluster""",

    // new-batch bands joined against the full band index; only pairs
    // touching the new batch (doc_id % 10 = 7) are emitted
    "q206_incremental_dedup" -> incrementalDedupOracle,

    // q211 computes the SAME pair set as q206 — the only change is
    // where the old side's bands come from (the persisted bucketed
    // index table instead of a recompute), which must be invisible in
    // the result; one oracle pins both
    "q211_persisted_index_dedup" -> incrementalDedupOracle,

    // q238 probes the base-plus-appended index with the %10==8 batch;
    // the oracle is the FROM-SCRATCH rebuild semantics (banded
    // candidates of that batch against everything else) — append
    // maintenance must be invisible in the result
    "q238_index_append" -> incrementalDedupOracleFor(8),

    // ground truth re-derived from the raw columns — the oracle never
    // parses the dirty URL, so it checks the canonicalizer itself
    "q207_url_canonicalize" -> """
      WITH t AS (
        SELECT
          'https://WWW.' || upper(source) || '.Example.COM:443/'
            || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR)
            || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
            || CASE WHEN doc_id % 3 = 0
                 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN doc_id % 3 = 1
                 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                   || '&utm_campaign=x'
                 ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) END
            || '#s' || CAST(doc_id % 4 AS VARCHAR) AS url,
          'https://www.' || lower(source) || '.example.com/'
            || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR)
            || '?id=' || CAST(doc_id % 7 AS VARCHAR) AS canon
        FROM documents)
      SELECT canon, COUNT(*) AS n_urls,
        COUNT(DISTINCT url) AS n_distinct_raw
      FROM t
      GROUP BY canon
      ORDER BY canon""",

    // two independent JSON parsers must agree on the quarantine split;
    // NULL raw is quarantined explicitly (json_valid(NULL) is NULL, so
    // a bare NOT would count it valid) and a missing/null $.k in valid
    // JSON contributes 0, matching the Spark side's coalesce
    "q208_json_quarantine" -> """
      WITH t AS (
        SELECT event_type,
          CASE WHEN event_id % 10 = 3 THEN '{' || props
               ELSE props END AS raw
        FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN raw IS NULL OR NOT json_valid(raw)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
        CAST(SUM(CASE WHEN raw IS NOT NULL AND json_valid(raw)
          THEN COALESCE(CAST(json_extract_string(raw, '$.k') AS BIGINT), 0)
          ELSE 0 END) AS BIGINT) AS k_sum
      FROM t
      GROUP BY event_type
      ORDER BY event_type""",

    // the four-stage curation pipeline, each stage over the previous
    // stage's survivors; counts via scalar subqueries
    "q209_curation_pipeline" -> curationPipelineOracle,

    // same chain edges (lead over doc_id per lang), then components as
    // the q69 recursive transitive closure — verifies the star
    // contraction against per-hop reachability on a high-diameter graph
    "q210_chain_components" -> """
      WITH RECURSIVE chain AS (
        SELECT doc_id, lang,
          lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS nxt
        FROM documents),
      edges AS (
        SELECT doc_id AS a, nxt AS b FROM chain WHERE nxt IS NOT NULL),
      sym AS (SELECT a AS src, b AS dst FROM edges
              UNION SELECT b, a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)
      SELECT label AS cluster, COUNT(*) AS n_docs, MAX(id) AS max_doc
      FROM labels
      GROUP BY label
      ORDER BY cluster""",

    // hint-free semantics: hints must never change results
    "q183_join_hints" -> """
      SELECT r_name, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_bal
      FROM customer c
      JOIN nation n ON c_nationkey = n_nationkey
      JOIN region r ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    // the media perceptual-hash tier, recomputed all-pairs: the 8-chunk
    // pigeonhole makes the Spark banded result EXACTLY the hamming<=7
    // pair set, so a brute-force oracle pins it bit-for-bit. Char
    // arithmetic here == the Spark side's payload-byte arithmetic
    // because the fixture is ASCII (documents are synthesized from an
    // ASCII vocabulary; q133's md5 round-trip would catch drift).
    "q214_media_phash" -> """
      WITH bins AS (
        SELECT doc_id, unnest(list_transform(range(1, length(text) - 2),
          j -> (((ascii(substr(text, j, 1)) * 31
                  + ascii(substr(text, j + 1, 1))) * 31
                 + ascii(substr(text, j + 2, 1))) * 31
                + ascii(substr(text, j + 3, 1))) % 128)) AS bin
        FROM documents WHERE length(text) >= 4),
      hist AS (
        SELECT doc_id, list_transform(range(0, 128), b ->
          coalesce(len(list_filter(bl, x -> x = b)), 0)) AS hist
        FROM (SELECT doc_id, list(bin) AS bl FROM bins GROUP BY doc_id)),
      h AS (
        SELECT doc_id,
          list_sum(list_transform(range(0, 63), b ->
            CASE WHEN hist[b + 2] > hist[b + 1]
                 THEN 1::BIGINT << b ELSE 0::BIGINT END)) AS h_lo,
          list_sum(list_transform(range(0, 63), b ->
            CASE WHEN hist[b + 66] > hist[b + 65]
                 THEN 1::BIGINT << b ELSE 0::BIGINT END)) AS h_hi
        FROM hist)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.h_lo, b.h_lo))
             + bit_count(xor(a.h_hi, b.h_hi)) AS INTEGER) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h_lo, b.h_lo))
            + bit_count(xor(a.h_hi, b.h_hi)) <= 7
      ORDER BY doc_a, doc_b""",

    // q69's component CTEs + token counts + argmax-by-quality: the
    // keep-best (not keep-first) representative policy, pinned exactly
    "q215_cluster_reps" -> """
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      toks AS (
        SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens FROM words),
      m AS (
        SELECT l.id, l.label, t.n_tokens,
          ROW_NUMBER() OVER (PARTITION BY l.label
            ORDER BY t.n_tokens DESC, l.id ASC) AS rk
        FROM labels l JOIN toks t ON t.doc_id = l.id)
      SELECT label AS cluster, COUNT(*) AS n_members,
        MAX(CASE WHEN rk = 1 THEN id END) AS rep_doc,
        MAX(CASE WHEN rk = 1 THEN n_tokens END) AS rep_tokens,
        CAST(SUM(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END) AS BIGINT)
          AS dropped_tokens
      FROM m GROUP BY label ORDER BY cluster""",

    // q113's gram CTEs kept positional, then gaps-and-islands to merge
    // contiguous contaminated offsets into redaction spans
    "q216_contamination_spans" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      hits AS (
        SELECT doc_id, pos FROM grams JOIN ev USING (gram)
        WHERE doc_id % 10 <> 0),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits)
      SELECT doc_id, MIN(pos) AS span_start,
        CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
        COUNT(*) AS n_grams
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start""",

    // the streaming admission gate is q206's new×old half with the
    // stream side always on the left: arriving (%10=7) docs probed
    // against the standing-corpus band index, exact-Jaccard verified
    "q217_stream_index_dedup" -> streamGateOracle,

    // q237 = q217 with watermark-bounded pair-dedup state; identical
    // admitted pairs on the fixture by construction, so one oracle
    // pins both (see StreamDedup.q237StreamGateBounded)
    "q237_stream_gate_bounded" -> streamGateOracle,

    // q216's positional-gram + islands CTEs with the candidate source
    // swapped: grams occurring in more than one DISTINCT document
    "q218_boilerplate_spans" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      df AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS df
        FROM grams GROUP BY gram),
      hits AS (
        SELECT g.doc_id, g.pos FROM grams g
        JOIN df USING (gram) WHERE df.df > 1),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits)
      SELECT doc_id, MIN(pos) AS span_start,
        CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
        COUNT(*) AS n_grams
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start""",

    // q218's span CTEs + token-level NOT EXISTS + ordered reassembly:
    // the md5 pins the redacted TEXT, not just the drop counts
    "q219_span_excision" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      toks AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS tok
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
              FROM docs) t),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      df AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS df
        FROM grams GROUP BY gram),
      hits AS (
        SELECT g.doc_id, g.pos FROM grams g
        JOIN df USING (gram) WHERE df.df > 1),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits),
      spans AS (
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end
        FROM isl GROUP BY doc_id, island),
      kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM toks t
        WHERE NOT EXISTS (
          SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id
            AND t.pos BETWEEN s.span_start AND s.span_end)),
      ka AS (
        SELECT doc_id, COUNT(*) AS n_kept,
          md5(string_agg(tok, ' ' ORDER BY pos)) AS redacted_md5
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.w) AS INTEGER) AS n_tokens,
        CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
        coalesce(ka.redacted_md5, md5('')) AS redacted_md5
      FROM docs d LEFT JOIN ka USING (doc_id)
      ORDER BY d.doc_id""",

    // symmetric smoothed KL between the two halves; per-token terms
    // round to 9 decimals and sum as exact decimals (q191's recipe)
    "q220_corpus_drift" -> """
      WITH tok AS (
        SELECT doc_id % 2 AS half, t.tok FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS tok
          FROM documents) t
        WHERE t.tok <> ''),
      counts AS (
        SELECT tok,
          CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_a,
          CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_b
        FROM tok GROUP BY tok),
      totals AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
          CAST(SUM(n_b) AS BIGINT) AS tot_b,
          COUNT(*) AS v
        FROM counts),
      terms AS (
        SELECT
          CAST(ROUND(p * ln(p / q), 9) AS DECIMAL(18,9)) AS t_ab,
          CAST(ROUND(q * ln(q / p), 9) AS DECIMAL(18,9)) AS t_ba
        FROM (
          SELECT
            CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + v AS DOUBLE) AS p,
            CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + v AS DOUBLE) AS q
          FROM counts CROSS JOIN totals) x)
      SELECT v AS n_vocab, tot_a AS n_tokens_a, tot_b AS n_tokens_b,
        ROUND(CAST(SUM(t_ab) AS DOUBLE), 9) AS kl_ab,
        ROUND(CAST(SUM(t_ba) AS DOUBLE), 9) AS kl_ba
      FROM terms CROSS JOIN totals
      GROUP BY v, tot_a, tot_b""",

    // all arithmetic on exact BIGINT counts until the final double
    // division, mirroring the Spark expression shapes exactly
    "q221_chi2_independence" -> """
      WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
        FROM documents GROUP BY lang, source),
      r AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS row_total
            FROM cells GROUP BY lang),
      c AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS col_total
            FROM cells GROUP BY source),
      g AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells),
      j AS (
        SELECT cells.lang, cells.source, observed, row_total, col_total,
          CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
            / CAST(n AS DOUBLE) AS expected
        FROM cells JOIN r USING (lang) JOIN c USING (source)
        CROSS JOIN g)
      SELECT lang, source, observed, row_total, col_total, expected,
        (CAST(observed AS DOUBLE) - expected)
          * (CAST(observed AS DOUBLE) - expected) / expected AS chi2_term
      FROM j
      ORDER BY lang, source""",

    "q222_kappa_agreement" -> """
      WITH scored AS (
        SELECT lang,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '), t -> list_contains(['the','a'], t)))
            AS s_en,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['le','la','les'], t))) AS s_fr,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['der','die','das'], t))) AS s_de,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['el','los','una'], t))) AS s_es
        FROM documents),
      pred AS (
        SELECT lang,
          CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es
                 THEN 'en'
               WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
               WHEN s_de >= s_es THEN 'de'
               ELSE 'es' END AS predicted
        FROM scored),
      conf AS (
        SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2),
      tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN lang = predicted THEN n ELSE 0 END)
            AS BIGINT) AS n_agree
        FROM conf),
      rm AS (SELECT lang AS label, CAST(SUM(n) AS BIGINT) AS r
             FROM conf GROUP BY 1),
      cm AS (SELECT predicted AS label, CAST(SUM(n) AS BIGINT) AS c
             FROM conf GROUP BY 1),
      x AS (SELECT CAST(SUM(r * c) AS BIGINT) AS rc
            FROM rm JOIN cm USING (label)),
      k AS (
        SELECT n_docs, n_agree,
          CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
          CAST(rc AS DOUBLE)
            / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS pe
        FROM tot CROSS JOIN x)
      SELECT n_docs, n_agree, po, pe, (po - pe) / (1 - pe) AS kappa
      FROM k""",

    // q25's banded-candidate CTEs without the 0.8 keep filter, swept
    // over the same threshold grid the Spark side explodes
    "q223_threshold_sweep" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      scored AS (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b)
      SELECT CAST(thr AS DOUBLE) AS threshold,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_flagged
      FROM scored
      CROSS JOIN (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS thr) t
      WHERE jaccard >= thr
      GROUP BY thr
      ORDER BY threshold""",

    // q25's verified pair set feeding the q33 quality buckets: docs in
    // any kept pair vs the full corpus, per bucket
    "q224_quality_dup_rate" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      dup AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs) u),
      q AS (
        SELECT doc_id,
          CASE WHEN len(w) >= 50
                    AND CAST(len(list_filter(w, t ->
                      list_contains(['the','a'], t))) AS DOUBLE)
                      / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
               WHEN len(w) >= 20 THEN 'medium'
               ELSE 'low' END AS quality
        FROM words)
      SELECT quality, n_docs, n_dup_docs,
        CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
      FROM (
        SELECT quality, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_docs
        FROM q LEFT JOIN dup USING (doc_id)
        GROUP BY quality) agg
      ORDER BY quality""",

    // the oracle's global-order window IS the single-task formulation
    // the Spark side decomposes into blocks — identical prefix sums
    "q225_budget_selection" -> """
      WITH n AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents),
      q AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS tokens,
          CASE WHEN len(w) >= 50
                    AND CAST(len(list_filter(w, t ->
                      list_contains(['the','a'], t))) AS DOUBLE)
                      / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
               WHEN len(w) >= 20 THEN 'medium'
               ELSE 'low' END AS quality
        FROM n),
      t AS (
        SELECT doc_id, tokens, quality,
          CASE quality WHEN 'high' THEN 0 WHEN 'medium' THEN 1
               ELSE 2 END AS tier
        FROM q),
      c AS (
        SELECT tier, quality, tokens,
          SUM(tokens) OVER (ORDER BY tier, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t),
      b AS (SELECT SUM(tokens) // 2 AS budget FROM t)
      SELECT tier, quality,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(tokens) AS BIGINT) AS tokens_total,
        CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN cum <= budget THEN tokens ELSE 0 END)
          AS BIGINT) AS tokens_kept
      FROM c CROSS JOIN b
      GROUP BY tier, quality
      ORDER BY tier""",

    // per-pair signature agreement from the minh CTE joined per seed;
    // exact-Jaccard means via integer micro-units (no float-sum order)
    "q226_minhash_calibration" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      m AS (
        SELECT doc_a, doc_b,
          CAST(COUNT(CASE WHEN a.mh = b.mh THEN 1 END) AS INTEGER)
            AS n_sig_matches
        FROM cand
        JOIN minh a ON a.doc_id = doc_a
        JOIN minh b ON b.doc_id = doc_b AND b.seed = a.seed
        GROUP BY doc_a, doc_b),
      s AS (
        SELECT m.n_sig_matches,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM m
        JOIN sh x ON x.doc_id = m.doc_a
        JOIN sh y ON y.doc_id = m.doc_b)
      SELECT n_sig_matches,
        CAST(n_sig_matches AS DOUBLE) / 16.0 AS est_jaccard,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CAST(ROUND(jaccard * 1000000.0) AS BIGINT)) AS DOUBLE)
          / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS avg_exact_jaccard
      FROM s
      GROUP BY n_sig_matches
      ORDER BY n_sig_matches""",

    // q180's injected corpus verbatim; the checksum pins every
    // redacted byte (48-bit md5 prefix summed order-free)
    "q227_pii_redaction" -> """
      WITH inj AS (
        SELECT source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE text END AS t
        FROM documents),
      red AS (
        SELECT source, t,
          regexp_replace(regexp_replace(t,
            '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS r
        FROM inj)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(CASE WHEN t <> r THEN 1 END) AS BIGINT)
          AS docs_redacted,
        CAST(SUM(len(regexp_extract_all(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT)
          AS emails_redacted,
        CAST(SUM(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')))
          AS BIGINT) AS phones_redacted,
        CAST(SUM(('0x' || substr(md5(r), 1, 12))::BIGINT) AS BIGINT)
          AS corpus_checksum,
        CAST(COUNT(CASE WHEN regexp_matches(r,
            '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}')
          OR regexp_matches(r, '\+1-555-[0-9]{4}') THEN 1 END)
          AS BIGINT) AS residual_pii
      FROM red GROUP BY source ORDER BY source""",

    "q228_shard_manifest" -> shardManifestOracle,

    // q69's recursive-CTE components; representative = the component's
    // min doc_id = the CC label on both sides
    "q229_cluster_downweight" -> clusterDownweightOracle,

    // the composed round report re-states the three section oracles
    // verbatim as subqueries — the composition must change nothing
    "q240_round_report" -> roundReportOracle,

    // q241 probes the COMPACTED index; compaction must be invisible in
    // the result, so the from-scratch rebuild oracle pins it (= q238)
    "q241_index_compaction" -> incrementalDedupOracleFor(8),

    // q242's incremental label update must equal the full-corpus
    // recompute — q69's cluster-summary oracle, same SQL text
    "q242_incremental_cc" -> dedupClustersOracle,

    // three generated BPE rounds (template below, like q150's) — the
    // oracle replays count → argmax (same tie-break) → replace
    "q243_bpe_merges" -> bpeMergesOracle,

    // mixture application: the filter uses the UNROUNDED rate on both
    // sides; only the reported rate column is rounded
    "q244_mixture_apply" -> """
      WITH d AS (
        SELECT doc_id, lang,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      bylang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_in,
          CAST(SUM(tokens) AS BIGINT) AS tokens_in
        FROM d GROUP BY lang),
      m AS (SELECT MIN(tokens_in) AS budget FROM bylang),
      rates AS (
        SELECT lang, n_docs_in, tokens_in,
          LEAST(1.0, CAST(budget AS DOUBLE) / CAST(tokens_in AS DOUBLE))
            AS rate
        FROM bylang CROSS JOIN m),
      kept AS (
        SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
          CAST(SUM(d.tokens) AS BIGINT) AS tokens_kept
        FROM d JOIN rates USING (lang)
        WHERE CAST(CAST(concat('0x',
            substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
            AS DOUBLE) / 16777216.0 < rates.rate
        GROUP BY d.lang)
      SELECT r.lang, r.n_docs_in, r.tokens_in, ROUND(r.rate, 9) AS rate,
        COALESCE(k.n_docs_kept, 0) AS n_docs_kept,
        COALESCE(k.tokens_kept, 0) AS tokens_kept
      FROM rates r LEFT JOIN kept k ON k.lang = r.lang
      ORDER BY r.lang""",

    // certificates for the remaining sketch families (the q234
    // pattern): the oracle owns the exact side and asserts the bound
    // flag as literal TRUE — sketch drift fails the round's hash
    "q245_percentile_cert" -> """
      SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        quantile_cont(o_totalprice, 0.99) AS p99,
        COUNT(*) AS n,
        TRUE AS within_bound
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q246_topk_cert" -> """
      WITH exact AS (
        SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY p_brand)
      SELECT p_brand, n_parts, TRUE AS certified
      FROM exact
      ORDER BY n_parts DESC, p_brand
      LIMIT 8""",

    "q247_hll_rollup_cert" -> """
      SELECT lang,
        COUNT(DISTINCT doc_id) AS exact_distinct,
        COUNT(DISTINCT source) AS n_sources,
        TRUE AS within_bound
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // The engine finds dist<=1 pairs via delete-1 SymSpell blocking
    // (recall-complete for dist<=1, see Quality.q230FuzzyJoin); the
    // oracle is deliberately the naive all-pairs definition the
    // blocking must reproduce exactly.
    "q230_fuzzy_join" -> """
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b""",

    // delete-2 blocking is recall-complete for dist<=2 (SymSpell), so
    // the oracle is again the naive all-pairs definition — over the
    // same %7 qualification slice (the dist<=2 relation on the full
    // table is Theta(n^2)-dense; see the q239 scaladoc)
    "q239_fuzzy_join_d2" -> """
      WITH s AS (SELECT c_custkey, c_name FROM customer
                 WHERE c_custkey % 7 = 3)
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      FROM s a JOIN s b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 2
      ORDER BY id_a, id_b""",

    "q231_overlap_profile" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      rare AS (SELECT s FROM shingles GROUP BY s HAVING count(*) <= 20),
      pruned AS (SELECT doc_id, s FROM shingles JOIN rare USING (s)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pruned a JOIN pruned b
          ON a.s = b.s AND a.doc_id < b.doc_id),
      scored AS (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS BIGINT) AS inter,
          CAST(len(x.shl) AS BIGINT) AS n_a,
          CAST(len(y.shl) AS BIGINT) AS n_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b),
      prof AS (
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS cont_a,
          CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE) AS cont_b,
          CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)
            AS jaccard
        FROM scored)
      SELECT doc_a, doc_b, cont_a, cont_b, jaccard,
        CASE WHEN jaccard >= 0.8 THEN 'mutual_dup'
             WHEN cont_a >= 0.9 THEN 'a_in_b'
             WHEN cont_b >= 0.9 THEN 'b_in_a'
             ELSE 'partial_overlap' END AS relation
      FROM prof
      WHERE jaccard >= 0.1 OR greatest(cont_a, cont_b) >= 0.9
      ORDER BY doc_a, doc_b""",

    // hashed linear classifier: md5-derived bucket + weight are both
    // engine-portable (hex prefix -> int), so the score is exact
    "q232_hashed_classifier" -> """
      WITH wrd AS (
        SELECT doc_id,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      b AS (
        SELECT doc_id,
          (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 4096)
            AS bucket
        FROM wrd),
      wt AS (
        SELECT doc_id,
          (CAST(concat('0x', substr(md5(concat('w',
             CAST(bucket AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000
            AS wt
        FROM b),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(wt) AS BIGINT) AS weight_sum
        FROM wt GROUP BY doc_id)
      SELECT doc_id, n_tokens, weight_sum,
        ROUND(CAST(weight_sum AS DOUBLE)
          / CAST(n_tokens * 1000 AS DOUBLE), 9) AS score,
        CASE WHEN ROUND(CAST(weight_sum AS DOUBLE)
               / CAST(n_tokens * 1000 AS DOUBLE), 9) >= 0.02 THEN 'keep'
             WHEN ROUND(CAST(weight_sum AS DOUBLE)
               / CAST(n_tokens * 1000 AS DOUBLE), 9) >= -0.02
               THEN 'borderline'
             ELSE 'drop' END AS label
      FROM agg
      ORDER BY doc_id""",

    // dynamic partition pruning: the dim's era filter reaches the
    // fact scan only through the join at runtime; the oracle states
    // the equivalent direct semantics (era = 'modern' <=> year >= 1999)
    "q233_dpp_join" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE YEAR(o_orderdate) >= 1999
      GROUP BY 1
      ORDER BY o_year""",

    // HLL certificate: the oracle owns the exact side and asserts the
    // within-bound flag as literal TRUE — a sketch drifting past 3×rsd
    // hash-mismatches the round (the estimate itself is engine-specific
    // and deliberately not in the output)
    "q234_hll_error_cert" -> """
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        COUNT(*) AS n_rows,
        TRUE AS within_bound
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // trigram stupid backoff: the oracle rebuilds all four count
    // tables over the same trigram event space, incl. the dedicated
    // c(w2) backoff denominator (NOT the trigram-final unigram table)
    "q235_trigram_backoff" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d3 AS (SELECT doc_id, w FROM wrd WHERE len(w) >= 3),
      tg AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i+1])) AS w2,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i+2])) AS w3
        FROM d3),
      train AS (SELECT * FROM tg WHERE doc_id % 10 <> 0),
      c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM train
             GROUP BY w1, w2, w3),
      cctx AS (SELECT w1, w2, COUNT(*) AS c_ctx FROM train GROUP BY w1, w2),
      cbg AS (SELECT w2, w3, COUNT(*) AS c_bg FROM train GROUP BY w2, w3),
      cbgctx AS (SELECT w2, COUNT(*) AS c_bg_ctx FROM train GROUP BY w2),
      cuni AS (SELECT w3, COUNT(*) AS c_uni FROM train GROUP BY w3),
      scal AS (SELECT COUNT(*) AS n_tok, COUNT(DISTINCT w3) AS v
               FROM train),
      held AS (SELECT * FROM tg WHERE doc_id % 10 = 0),
      scored AS (
        SELECT h.doc_id,
          CAST(ROUND(-ln(
            CASE WHEN c3.c3 IS NOT NULL
                 THEN CAST(c3.c3 AS DOUBLE) / CAST(cctx.c_ctx AS DOUBLE)
                 WHEN cbg.c_bg IS NOT NULL AND cbgctx.c_bg_ctx IS NOT NULL
                 THEN 0.4 * CAST(cbg.c_bg AS DOUBLE)
                      / CAST(cbgctx.c_bg_ctx AS DOUBLE)
                 ELSE 0.16 * CAST(COALESCE(cuni.c_uni, 0) + 1 AS DOUBLE)
                      / CAST(s.n_tok + s.v AS DOUBLE) END), 9)
            AS DECIMAL(28,9)) AS nll
        FROM held h
        LEFT JOIN c3 ON c3.w1 = h.w1 AND c3.w2 = h.w2 AND c3.w3 = h.w3
        LEFT JOIN cctx ON cctx.w1 = h.w1 AND cctx.w2 = h.w2
        LEFT JOIN cbg ON cbg.w2 = h.w2 AND cbg.w3 = h.w3
        LEFT JOIN cbgctx ON cbgctx.w2 = h.w2
        LEFT JOIN cuni ON cuni.w3 = h.w3
        CROSS JOIN scal s)
      SELECT doc_id, COUNT(*) AS n_trigrams,
        ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_nll
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id""",

    // source-concentration mixture report; zero-token sources are
    // filtered on BOTH sides so ln(share) stays finite
    "q236_source_concentration" -> """
      WITH tok AS (
        SELECT lang, source,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      bysrc AS (
        SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        FROM tok GROUP BY lang, source
        HAVING CAST(SUM(n_tokens) AS BIGINT) > 0),
      sh AS (
        SELECT lang, src_tokens,
          CAST(src_tokens AS DOUBLE)
            / CAST(SUM(src_tokens) OVER (PARTITION BY lang) AS DOUBLE)
            AS share
        FROM bysrc)
      SELECT lang, CAST(SUM(src_tokens) AS BIGINT) AS lang_tokens,
        COUNT(*) AS n_sources,
        CAST(SUM(CAST(ROUND(share * share, 9) AS DECIMAL(28,9)))
          AS DOUBLE) AS hhi,
        CAST(SUM(CAST(ROUND(-share * ln(share), 9) AS DECIMAL(28,9)))
          AS DOUBLE) AS entropy,
        ROUND(MAX(share), 9) AS top_share
      FROM sh
      GROUP BY lang
      ORDER BY lang""",

    // q248/q249 share the two-round Lloyd chain: seed = 8 lowest
    // vec_ids, distances rounded to 9 before the argmin (tie-break =
    // lowest cid, DuckDB's row_number ORDER BY dist, cid mirroring
    // Spark's array_position-first-min), centers re-averaged to 9
    // decimals between rounds so both engines iterate from identical
    // doubles. SSE sums 9-rounded dists as exact DECIMAL(28,9).
    "q248_kmeans_assign" -> s"""
      $kmeansCtes
      SELECT CAST(cid AS INT) AS cid, count(*) AS n,
        CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE) AS sse
      FROM a2 GROUP BY cid ORDER BY cid""",

    "q249_semdedup" -> s"""
      $kmeansCtes,
      nrm AS (
        SELECT cid, vec_id,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM a2),
      pairs AS (
        SELECT a.cid, a.vec_id AS a_id, b.vec_id AS b_id,
          ROUND(list_reduce(list_transform(list_zip(a.vn, b.vn),
              p -> p[1]*p[2]), (x,y) -> x + y), 9) AS cos
        FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      dropped AS (
        SELECT cid, count(*) AS n_dropped FROM
          (SELECT DISTINCT cid, b_id FROM pairs WHERE cos >= 0.35)
        GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, count(*) AS n,
        COALESCE(d.n_dropped, 0) AS n_dropped,
        count(*) - COALESCE(d.n_dropped, 0) AS n_kept
      FROM a2 a LEFT JOIN dropped d ON a.cid = d.cid
      GROUP BY a.cid, d.n_dropped ORDER BY cid""",

    // reliability diagram + ECE over the q232 score; fixed-width bins
    // on the min-max-normalized score (no corpus-wide ntile), bin
    // means as exact DECIMAL sums of 9-rounded p
    "q250_calibration" -> """
      WITH wrd AS (
        SELECT doc_id, lang,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, lang,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, lang,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, lang),
      mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM s),
      p AS (SELECT lang, ROUND((score - lo) / (hi - lo), 9) AS p
            FROM s CROSS JOIN mm),
      bn AS (SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INT) AS bin, p, lang
             FROM p),
      bins AS (
        SELECT bin, COUNT(*) AS n,
          ROUND(CAST(SUM(CAST(p AS DECIMAL(28,9))) AS DOUBLE)
            / COUNT(*), 9) AS avg_p,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*), 9) AS pos_rate
        FROM bn GROUP BY bin),
      g AS (SELECT *, ROUND(ABS(avg_p - pos_rate), 9) AS gap FROM bins),
      tot AS (SELECT ROUND(CAST(SUM(CAST(gap AS DECIMAL(28,9)) * n)
                AS DOUBLE) / SUM(n), 9) AS ece FROM g)
      SELECT bin, n, avg_p, n_pos, pos_rate, gap, ece
      FROM g CROSS JOIN tot ORDER BY bin""",

    // sqrt-temperature mixture, 1.2-epoch cap; Z rounds to 6 decimals
    // before any division, sqrt is IEEE-exact on both engines
    "q251_temperature_mix" -> """
      WITH tok AS (
        SELECT lang,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS n
        FROM documents),
      byl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tokens
              FROM tok GROUP BY lang),
      z AS (SELECT ROUND(SUM(sqrt(tokens)), 6) AS z,
              CAST(SUM(tokens) AS BIGINT) AS budget FROM byl),
      m AS (
        SELECT lang, tokens,
          ROUND(sqrt(tokens) / z, 9) AS weight,
          ROUND(ROUND(sqrt(tokens) / z, 9) * budget, 3) AS target_tokens,
          ROUND(LEAST(ROUND(ROUND(sqrt(tokens) / z, 9) * budget, 3),
            tokens * CAST(1.2 AS DOUBLE)), 3) AS capped_tokens
        FROM byl CROSS JOIN z)
      SELECT lang, tokens, weight, target_tokens, capped_tokens,
        ROUND(capped_tokens / tokens, 9) AS epochs
      FROM m ORDER BY lang""",

    // DSIR: add-one-smoothed unigram log-likelihood ratio vs the src0
    // target; per-token ratios round to 9 then decimal-sum
    "q252_dsir_select" -> """
      WITH tok AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      tgt AS (SELECT word, CAST(count(*) AS BIGINT) AS ct
              FROM tok WHERE source = 'src0' GROUP BY word),
      raw AS (SELECT word, CAST(count(*) AS BIGINT) AS cr
              FROM tok GROUP BY word),
      sc AS (SELECT CAST(count(*) AS BIGINT) AS nt
             FROM tok WHERE source = 'src0'),
      sr AS (SELECT CAST(count(*) AS BIGINT) AS nr,
               CAST(count(DISTINCT word) AS BIGINT) AS v FROM tok),
      scored AS (
        SELECT t.doc_id,
          ROUND(ln((CAST(COALESCE(g.ct, 0) + 1 AS DOUBLE)
                     * CAST(sr.nr + sr.v AS DOUBLE))
                 / (CAST(r.cr + 1 AS DOUBLE)
                     * CAST(sc.nt + sr.v AS DOUBLE))), 9) AS lr
        FROM tok t
        LEFT JOIN tgt g USING (word)
        JOIN raw r USING (word)
        CROSS JOIN sc CROSS JOIN sr),
      agg AS (
        SELECT doc_id, count(*) AS n_tokens,
          ROUND(CAST(SUM(CAST(lr AS DECIMAL(28,9))) AS DOUBLE)
            / count(*), 9) AS dsir_score
        FROM scored GROUP BY doc_id)
      SELECT d.doc_id, d.lang, d.source, a.n_tokens, a.dsir_score
      FROM agg a JOIN documents d USING (doc_id)
      ORDER BY a.dsir_score DESC, d.doc_id LIMIT 25""",

    // winnowing: 4-gram hashes, window w=5, min per full window;
    // 1-based positions here vs 0-based in Spark — same full-window set
    "q253_winnowing" -> """
      WITH tok AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ') AS w
        FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
          CAST(concat('0x', substr(md5(concat(w[CAST(i AS INT)], ' ',
            w[CAST(i AS INT)+1], ' ', w[CAST(i AS INT)+2], ' ',
            w[CAST(i AS INT)+3])), 1, 8)) AS BIGINT) AS h
        FROM tok, unnest(range(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 4),
      wins AS (
        SELECT doc_id, pos,
          MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
          COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
        FROM grams),
      full_w AS (SELECT * FROM wins WHERE pos <= n_grams - 4)
      SELECT doc_id, MAX(n_grams) AS n_grams, count(*) AS n_windows,
        CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
        ROUND(CAST(count(DISTINCT fp) AS DOUBLE) / MAX(n_grams), 9)
          AS density
      FROM full_w GROUP BY doc_id ORDER BY doc_id""",

    // leave-one-out 1-NN over unit-normalized vectors; cosine rounds
    // to 9 before the argmax, tie-break lowest candidate id
    "q254_label_knn" -> """
      WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, label,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM e),
      pr AS (SELECT vec_id AS p_id, label AS p_label, vn AS pv
             FROM n WHERE vec_id % 10 = 0),
      cand AS (
        SELECT p.p_id, p.p_label, c.label AS n_label, c.vec_id,
          ROUND(list_reduce(list_transform(list_zip(c.vn, p.pv),
            s -> s[1]*s[2]), (x,y) -> x + y), 9) AS cos
        FROM pr p JOIN n c ON c.vec_id <> p.p_id),
      best AS (
        SELECT p_id, p_label, n_label, cos FROM
          (SELECT *, row_number() OVER (PARTITION BY p_id
             ORDER BY cos DESC, vec_id ASC) AS rn FROM cand)
        WHERE rn = 1)
      SELECT p_label AS label, count(*) AS n_probes,
        CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END)
          AS BIGINT) AS n_correct,
        ROUND(CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 9) AS accuracy,
        ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,9))) AS DOUBLE)
          / count(*), 9) AS mean_nn_cos
      FROM best GROUP BY p_label ORDER BY label""",

    // per-cluster distance percentiles + robust outlier count over the
    // shared Lloyd chain; exact interpolated percentiles (q174 parity)
    "q255_ood_report" -> s"""
      $kmeansCtes,
      pct AS (
        SELECT cid, count(*) AS n,
          ROUND(quantile_cont(dist, 0.5), 9) AS p50,
          ROUND(quantile_cont(dist, 0.9), 9) AS p90,
          ROUND(quantile_cont(dist, 0.99), 9) AS p99
        FROM a2 GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, MAX(p.n) AS n, MAX(p.p50) AS p50,
        MAX(p.p90) AS p90, MAX(p.p99) AS p99,
        CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_outliers
      FROM a2 a JOIN pct p ON a.cid = p.cid
      GROUP BY a.cid ORDER BY cid""",

    "q256_prefix_dup" -> """
      WITH tok AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ') AS w
        FROM documents),
      pfx AS (
        SELECT doc_id, array_to_string(w[1:8], ' ') AS prefix
        FROM tok WHERE len(w) >= 8),
      agg AS (
        SELECT prefix, count(*) AS n_docs,
          MIN(doc_id) AS first_doc
        FROM pfx GROUP BY prefix HAVING count(*) >= 2)
      SELECT prefix, n_docs, first_doc FROM agg
      ORDER BY n_docs DESC, prefix LIMIT 20""",

    // same probe-candidate stream as q254; μ sums 9-rounded cosines
    // as exact decimals before the single threshold compare
    "q257_hard_negatives" -> """
      WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, label,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM e),
      pr AS (SELECT vec_id AS p_id, label AS p_label, vn AS pv
             FROM n WHERE vec_id % 10 = 0),
      cand AS (
        SELECT p.p_id, p.p_label, c.label AS c_label,
          ROUND(list_reduce(list_transform(list_zip(c.vn, p.pv),
            s -> s[1]*s[2]), (x,y) -> x + y), 9) AS cos
        FROM pr p JOIN n c ON c.vec_id <> p.p_id),
      mu AS (
        SELECT p_id, p_label,
          ROUND(CAST(SUM(CASE WHEN c_label = p_label
                THEN CAST(cos AS DECIMAL(28,9)) ELSE 0 END) AS DOUBLE)
            / SUM(CASE WHEN c_label = p_label THEN 1 ELSE 0 END), 9)
            AS mu
        FROM cand GROUP BY p_id, p_label),
      hard AS (
        SELECT c.p_id, c.p_label,
          CAST(SUM(CASE WHEN c.c_label <> c.p_label AND c.cos > m.mu
            THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
        FROM cand c JOIN mu m ON c.p_id = m.p_id
        GROUP BY c.p_id, c.p_label)
      SELECT p_label AS label, count(*) AS n_probes,
        CAST(SUM(n_hard) AS BIGINT) AS n_hard_total,
        ROUND(CAST(SUM(n_hard) AS DOUBLE) / count(*), 9)
          AS mean_hard_per_probe
      FROM hard GROUP BY p_label ORDER BY label""",

    "q258_source_gates" -> """
      WITH base AS (
        SELECT doc_id, source,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
          length(text) AS n_chars_raw,
          length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
        FROM documents),
      feat AS (
        SELECT doc_id, source,
          len(string_split(norm, ' ')) AS n_tok,
          CAST(n_digits AS DOUBLE) / n_chars_raw AS digit_ratio,
          CAST(length(norm) - (len(string_split(norm, ' ')) - 1)
            AS DOUBLE) / len(string_split(norm, ' ')) AS mean_wl,
          (doc_id % 7 = 0) AS pii
        FROM base),
      g AS (
        SELECT source,
          (n_tok BETWEEN 20 AND 2000) AS len_ok,
          (digit_ratio <= 0.2) AS digit_ok,
          (mean_wl BETWEEN 2 AND 12) AS wl_ok, pii
        FROM feat)
      SELECT source, count(*) AS n_docs,
        CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_len_ok,
        CAST(SUM(CASE WHEN digit_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_digit_ok,
        CAST(SUM(CASE WHEN wl_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_wl_ok,
        CAST(SUM(CASE WHEN pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii,
        CAST(SUM(CASE WHEN len_ok AND digit_ok AND wl_ok AND NOT pii
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM g GROUP BY source ORDER BY source""",

    // composed embedding-tier report: the q248/q249/q255 section
    // oracles unioned over ONE shared Lloyd chain
    "q259_embed_report" -> s"""
      $kmeansCtes,
      nrm AS (
        SELECT cid, vec_id,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM a2),
      pairs AS (
        SELECT a.cid, a.vec_id AS a_id, b.vec_id AS b_id,
          ROUND(list_reduce(list_transform(list_zip(a.vn, b.vn),
              p -> p[1]*p[2]), (x,y) -> x + y), 9) AS cos
        FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      dropped AS (
        SELECT cid, count(*) AS n_dropped FROM
          (SELECT DISTINCT cid, b_id FROM pairs WHERE cos >= 0.35)
        GROUP BY cid),
      sem AS (
        SELECT a.cid, count(*) AS n, COALESCE(d.n_dropped, 0) AS nd
        FROM a2 a LEFT JOIN dropped d ON a.cid = d.cid
        GROUP BY a.cid, d.n_dropped),
      pct AS (
        SELECT cid, count(*) AS n,
          ROUND(quantile_cont(dist, 0.5), 9) AS p50,
          ROUND(quantile_cont(dist, 0.99), 9) AS p99
        FROM a2 GROUP BY cid),
      ood AS (
        SELECT a.cid, MAX(p.n) AS n, MAX(p.p99) AS p99,
          CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_out
        FROM a2 a JOIN pct p ON a.cid = p.cid
        GROUP BY a.cid)
      SELECT 'kmeans' AS section, CAST(cid AS BIGINT) AS seq,
        count(*) AS n_a, CAST(NULL AS BIGINT) AS n_b,
        CAST(NULL AS BIGINT) AS n_c,
        ROUND(CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE), 9)
          AS metric
      FROM a2 GROUP BY cid
      UNION ALL
      SELECT 'semdedup', CAST(cid AS BIGINT), n, nd, n - nd,
        ROUND(CAST(nd AS DOUBLE) / n, 9)
      FROM sem
      UNION ALL
      SELECT 'ood', CAST(cid AS BIGINT), n, n_out,
        CAST(NULL AS BIGINT), p99
      FROM ood
      ORDER BY section, seq""",

    // stream-batch equivalence: the online router's drained counts
    // must equal the batch Lloyd chain + q255 outlier rule
    "q260_stream_router" -> s"""
      $kmeansCtes,
      pct AS (
        SELECT cid, ROUND(quantile_cont(dist, 0.5), 9) AS p50
        FROM a2 GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, count(*) AS n_assigned,
        CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_flagged
      FROM a2 a JOIN pct p ON a.cid = p.cid
      GROUP BY a.cid ORDER BY cid""",

    // Heaps growth over trigram types: min-chunk per type gives the
    // whole cumulative curve in one shuffle; β from exact decimal
    // sums of 9-rounded log points
    "q261_heaps_law" -> """
      WITH tok AS (
        SELECT doc_id % 10 AS b,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      g AS (
        SELECT b, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
          || ' ' || w[CAST(i AS INT)+2] AS gram
        FROM tok, unnest(range(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 3),
      tb AS (SELECT b, CAST(count(*) AS BIGINT) AS t FROM g GROUP BY b),
      wmin AS (SELECT gram, MIN(b) AS minb FROM g GROUP BY gram),
      vb AS (SELECT minb AS b, CAST(count(*) AS BIGINT) AS v
             FROM wmin GROUP BY minb),
      pre AS (
        SELECT tb.b AS prefix,
          CAST(SUM(tb.t) OVER (ORDER BY tb.b) AS BIGINT)
            AS n_grams_cum,
          CAST(SUM(COALESCE(vb.v, 0)) OVER (ORDER BY tb.b) AS BIGINT)
            AS types_cum
        FROM tb LEFT JOIN vb ON tb.b = vb.b),
      pts AS (
        SELECT prefix, n_grams_cum, types_cum,
          ROUND(ln(n_grams_cum), 9) AS x,
          ROUND(ln(types_cum), 9) AS y
        FROM pre),
      fit AS (
        SELECT count(*) AS n,
          CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(ROUND(x*y, 9) AS DECIMAL(28,9))) AS DOUBLE)
            AS sxy,
          CAST(SUM(CAST(ROUND(x*x, 9) AS DECIMAL(28,9))) AS DOUBLE)
            AS sxx
        FROM pts)
      SELECT p.prefix, p.n_grams_cum, p.types_cum,
        ROUND((f.n * f.sxy - f.sx * f.sy)
          / (f.n * f.sxx - f.sx * f.sx), 6) AS beta
      FROM pts p CROSS JOIN fit f ORDER BY p.prefix""",

    // discrete KS on the pooled ventile grid; bin assignment via
    // list_filter against the rounded quantile list
    "q262_score_drift" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      thr AS (
        SELECT list_transform(quantile_cont(score,
          [0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50,
           0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95]),
          q -> ROUND(q, 9)) AS g
        FROM s),
      b AS (
        SELECT source, len(list_filter(g, t -> score > t)) AS bin
        FROM s CROSS JOIN thr),
      sb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n
             FROM b GROUP BY source, bin),
      grid AS (SELECT CAST(j AS INT) AS j FROM unnest(range(1, 20))
               AS t(j)),
      src_n AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src
                FROM sb GROUP BY source),
      f AS (
        SELECT sb.source, g.j,
          CAST(SUM(CASE WHEN sb.bin < g.j THEN sb.n ELSE 0 END)
            AS BIGINT) AS c
        FROM sb CROSS JOIN grid g GROUP BY sb.source, g.j),
      fc AS (
        SELECT g.j,
          CAST(SUM(CASE WHEN sb.bin < g.j THEN sb.n ELSE 0 END)
            AS BIGINT) AS cc
        FROM sb CROSS JOIN grid g GROUP BY g.j),
      nc AS (SELECT CAST(SUM(n) AS BIGINT) AS nc FROM sb),
      d AS (
        SELECT f.source, f.j,
          ROUND(ABS(CAST(f.c AS DOUBLE) / sn.n_src
            - CAST(fc.cc AS DOUBLE) / nc.nc), 9) AS diff
        FROM f JOIN fc ON f.j = fc.j
        JOIN src_n sn ON f.source = sn.source
        CROSS JOIN nc)
      SELECT source, MAX(diff) AS ks,
        CAST(MIN(CASE WHEN diff = mx THEN j END) AS INT) AS worst_j
      FROM (SELECT *, MAX(diff) OVER (PARTITION BY source) AS mx FROM d)
      GROUP BY source ORDER BY source""",

    // chunk grid is pure integer arithmetic: 1 + ceil(max(0,n-64)/48)
    // chunks per doc, slice end clamped by the list length on both
    // engines
    "q263_doc_chunks" -> """
      WITH w AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM w),
      k AS (
        SELECT doc_id, w, n,
          unnest(range(0, 1 + (greatest(n - 64, 0) + 47) // 48)) AS k
        FROM n)
      SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        CAST(k * 48 AS BIGINT) AS chunk_start,
        least(64, n - k * 48) AS chunk_len,
        array_to_string(w[CAST(k * 48 + 1 AS BIGINT)
          : CAST(least(k * 48 + 64, n) AS BIGINT)], ' ') AS chunk_text
      FROM k ORDER BY doc_id, chunk_idx""",

    // the sketch is rebuilt cell-for-cell from the same md5 row
    // hashes; the 3N/W bound check is pure integer arithmetic
    "q264_cms_cert" -> """
      WITH wrd AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS word
        FROM documents),
      wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM wrd WHERE length(word) >= 1 GROUP BY word),
      n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM wc),
      hk AS (
        SELECT word, cnt, i,
          CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR),
            '|', word)), 1, 8)) AS BIGINT) % 512 AS bucket
        FROM wc CROSS JOIN (SELECT unnest(range(0, 4)) AS i) r),
      sk AS (
        SELECT i, bucket, CAST(SUM(cnt) AS BIGINT) AS bcnt
        FROM hk GROUP BY i, bucket),
      probes AS (
        SELECT word, cnt AS exact_cnt FROM wc
        ORDER BY cnt DESC, word LIMIT 20),
      est AS (
        SELECT p.word, CAST(MIN(s.bcnt) AS BIGINT) AS est_cnt
        FROM probes p
        JOIN hk ON hk.word = p.word
        JOIN sk s ON s.i = hk.i AND s.bucket = hk.bucket
        GROUP BY p.word)
      SELECT p.word, p.exact_cnt, e.est_cnt,
        e.est_cnt - p.exact_cnt AS err,
        (e.est_cnt - p.exact_cnt) * 512 <= 3 * n.n_total AS within_bound
      FROM probes p JOIN est e ON e.word = p.word CROSS JOIN n
      ORDER BY p.exact_cnt DESC, p.word""",

    // fixed-width balance bands keep the audit shard-composable;
    // SUM(int) would be HUGEINT, so counts stay count(*) BIGINTs
    "q265_k_anonymity" -> """
      WITH cls AS (
        SELECT c_mktsegment, c_nationkey,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(count(*) AS BIGINT) AS class_size
        FROM customer
        GROUP BY c_mktsegment, c_nationkey, bal_band)
      SELECT class_size,
        CAST(count(*) AS BIGINT) AS n_classes,
        CAST(count(*) * class_size AS BIGINT) AS n_rows,
        class_size < 5 AS at_risk
      FROM cls GROUP BY class_size ORDER BY class_size""",

    // two stacked group-bys mirror the Spark no-Expand distinct;
    // SUM casts keep DuckDB's HUGEINT out of the schema
    "q266_l_diversity" -> """
      WITH cls AS (
        SELECT c_nationkey,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
          CAST(COUNT(*) AS BIGINT) AS class_size
        FROM customer GROUP BY c_nationkey, bal_band)
      SELECT l_div, CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(class_size) AS BIGINT) AS n_rows,
        l_div < 3 AS at_risk
      FROM cls GROUP BY l_div ORDER BY l_div""",

    "q267_bpe_encode" -> bpeEncodeOracle,

    // same score CTEs as q262; quantile_cont matches Spark's exact
    // interpolating percentile; every per-row term rounds to 9 before
    // the comparison so the outlier flag is engine-portable
    "q268_mad_outliers" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      med AS (
        SELECT source, ROUND(quantile_cont(score, 0.5), 9) AS med
        FROM s GROUP BY source),
      dev AS (
        SELECT s.source, m.med, ROUND(ABS(s.score - m.med), 9) AS dev
        FROM s JOIN med m ON s.source = m.source),
      mad AS (
        SELECT source, ROUND(quantile_cont(dev, 0.5), 9) AS mad
        FROM dev GROUP BY source)
      SELECT d.source,
        CAST(count(*) AS BIGINT) AS n_docs, d.med, a.mad,
        CAST(SUM(CASE WHEN d.dev > ROUND(a.mad * 4.4478, 9)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        ROUND(CAST(SUM(CASE WHEN d.dev > ROUND(a.mad * 4.4478, 9)
            THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9) AS outlier_rate
      FROM dev d JOIN mad a ON d.source = a.source
      GROUP BY d.source, d.med, a.mad ORDER BY d.source""",

    // q268's CTEs with the score carried through; the clip, the
    // displaced mass, and the zero-residual certificate all mirror
    // the Spark rounding discipline term for term
    "q269_robust_clip" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      med AS (
        SELECT source, ROUND(quantile_cont(score, 0.5), 9) AS med
        FROM s GROUP BY source),
      dev AS (
        SELECT s.source, m.med, s.score,
          ROUND(ABS(s.score - m.med), 9) AS dev
        FROM s JOIN med m ON s.source = m.source),
      mad AS (
        SELECT source, ROUND(quantile_cont(dev, 0.5), 9) AS mad
        FROM dev GROUP BY source),
      c AS (
        SELECT d.source, d.med, a.mad, d.score,
          ROUND(a.mad * 4.4478, 9) AS hw,
          ROUND(d.med - ROUND(a.mad * 4.4478, 9), 9) AS lo,
          ROUND(d.med + ROUND(a.mad * 4.4478, 9), 9) AS hi
        FROM dev d JOIN mad a ON d.source = a.source),
      cc AS (
        SELECT source, med, mad, score, hw, lo, hi,
          LEAST(GREATEST(score, lo), hi) AS clipped
        FROM c)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, med, mad,
        CAST(SUM(CASE WHEN score < lo THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped_lo,
        CAST(SUM(CASE WHEN score > hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped_hi,
        ROUND(CAST(SUM(CAST(ROUND(ABS(score - clipped), 9)
          AS DECIMAL(28,9))) AS DOUBLE), 9) AS mass_moved,
        CAST(SUM(CASE WHEN ROUND(ABS(clipped - med), 9) > hw
          THEN 1 ELSE 0 END) AS BIGINT) AS n_residual
      FROM cc GROUP BY source, med, mad ORDER BY source""",

    "q270_split_repair" -> splitRepairOracle,

    // one-pass window skyline: identical dominance predicate to the
    // two-level Spark plan (they are provably the same set)
    "q271_skyline" -> """
      WITH wrd AS (
        SELECT doc_id, lang,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, lang,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, lang),
      sky AS (
        SELECT doc_id, lang, n_tokens, score,
          MAX(score) OVER (PARTITION BY lang ORDER BY n_tokens
            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS my_gt,
          MAX(score) OVER (PARTITION BY lang, n_tokens) AS my_eq
        FROM s)
      SELECT doc_id, lang, n_tokens, score FROM sky
      WHERE (my_gt IS NULL OR my_gt < score) AND my_eq = score
      ORDER BY lang, n_tokens DESC, doc_id""",

    // integer-scaled centering (n*x - S) keeps numerator/denominator
    // exact; the only float op is the final division
    "q272_acf" -> """
      WITH h AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
          AS BIGINT) // 3600 AS hr,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h),
      g AS (SELECT unnest(range(b.lo, b.hi + 1)) AS hr FROM b),
      s AS (SELECT g.hr, COALESCE(h.x, 0) AS x
            FROM g LEFT JOIN h ON h.hr = g.hr),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sm FROM s),
      c AS (SELECT hr, t.n * x - t.sm AS c FROM s CROSS JOIN t),
      d AS (SELECT CAST(SUM(c * c) AS BIGINT) AS den FROM c),
      lags AS (SELECT unnest(range(1, 25)) AS lag),
      p AS (
        SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(a.c * b2.c) AS BIGINT) AS num
        FROM c a CROSS JOIN lags l JOIN c b2 ON b2.hr = a.hr + l.lag
        GROUP BY l.lag)
      SELECT CAST(p.lag AS INT) AS lag, p.n_pairs,
        ROUND(CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE), 9) AS acf
      FROM p CROSS JOIN d ORDER BY lag""",

    // same integer scaling; argmax tie-break (|S| desc, earliest day)
    // mirrors the Spark struct-max exactly
    "q273_cusum" -> cusumOracle,

    // stream-batch equivalence: the streamed daily aggregate feeds the
    // identical finishing math, so q273's oracle pins the stream too
    "q277_stream_cusum" -> cusumOracle,

    // all day-pair slopes of the daily aggregate; quantile_cont is
    // Spark's exact interpolating percentile
    "q278_theil_sen" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      sl AS (
        SELECT a.event_type,
          ROUND(CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE), 9)
            AS slope
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d),
      med AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          ROUND(quantile_cont(slope, 0.5), 9) AS slope_med
        FROM sl GROUP BY event_type),
      b0 AS (
        SELECT d.event_type, m.n_pairs, m.slope_med,
          ROUND(CAST(d.x AS DOUBLE) - m.slope_med * CAST(d.d AS DOUBLE),
            9) AS b0
        FROM daily d JOIN med m ON m.event_type = d.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, n_pairs,
        slope_med AS slope, ROUND(quantile_cont(b0, 0.5), 9) AS intercept
      FROM b0 GROUP BY event_type, n_pairs, slope_med
      ORDER BY event_type""",

    "q279_deletion_propagation" -> deletionPropagationOracle,

    "q280_rank_fusion" -> rankFusionOracle,

    "q281_ndcg_ablation" -> ndcgAblationOracle,

    // q268's score CTEs + the grouped-jackknife arithmetic, every
    // intermediate rounded to 9 before its decimal sum
    "q282_jackknife_se" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      sh2 AS (
        SELECT source,
          CAST(concat('0x', substr(md5(concat('jk',
            CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 16 AS j,
          CAST(COUNT(*) AS BIGINT) AS nj,
          SUM(CAST(score AS DECIMAL(28,9))) AS sj
        FROM s GROUP BY source, j),
      tot AS (
        SELECT source, CAST(SUM(nj) AS BIGINT) AS n, SUM(sj) AS stot,
          CAST(COUNT(*) AS BIGINT) AS g
        FROM sh2 GROUP BY source HAVING COUNT(*) >= 2),
      mj AS (
        SELECT s2.source, t.g, t.n, t.stot,
          ROUND(CAST(t.stot - s2.sj AS DOUBLE)
            / CAST(t.n - s2.nj AS DOUBLE), 9) AS mj
        FROM sh2 s2 JOIN tot t ON t.source = s2.source),
      mb AS (
        SELECT source, ROUND(CAST(SUM(CAST(mj AS DECIMAL(28,9)))
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS mbar
        FROM mj GROUP BY source),
      d2 AS (
        SELECT m.source, m.g, m.n, m.stot,
          CAST(ROUND((m.mj - b.mbar) * (m.mj - b.mbar), 9)
            AS DECIMAL(28,9)) AS d2
        FROM mj m JOIN mb b ON b.source = m.source),
      fin AS (
        SELECT source, g, n, stot, SUM(d2) AS ssd
        FROM d2 GROUP BY source, g, n, stot)
      SELECT source, n AS n_docs, g AS n_shards,
        ROUND(CAST(stot AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_score,
        ROUND(sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE)
          * CAST(ssd AS DOUBLE)), 9) AS se_jack
      FROM fin ORDER BY source""",

    // floor(epoch()) mirrors Spark's second-truncating unix_timestamp
    // on the microsecond event times; greedy-from-earliest chaining
    "q283_window_funnel" -> """
      WITH e AS (SELECT user_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts FROM events),
      s AS (SELECT user_id, MIN(ts) AS s_ts FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS c_ts, MIN(s.s_ts) AS s_ts
            FROM e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.s_ts
              AND CAST(floor(epoch(e.ts)) AS BIGINT)
                <= CAST(floor(epoch(s.s_ts)) AS BIGINT) + 86400
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS p_ts, MIN(c.s_ts) AS s_ts
            FROM e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
              AND CAST(floor(epoch(e.ts)) AS BIGINT)
                <= CAST(floor(epoch(c.c_ts)) AS BIGINT) + 86400
            GROUP BY e.user_id)
      SELECT * FROM (
        SELECT '1_signup' AS step, CAST(COUNT(*) AS BIGINT) AS n_users,
          ROUND(quantile_cont(CAST(floor(epoch(s_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
            AS median_hours_from_signup
        FROM s
        UNION ALL
        SELECT '2_click_24h', CAST(COUNT(*) AS BIGINT),
          ROUND(quantile_cont(CAST(floor(epoch(c_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
        FROM c
        UNION ALL
        SELECT '3_purchase_24h', CAST(COUNT(*) AS BIGINT),
          ROUND(quantile_cont(CAST(floor(epoch(p_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
        FROM p) u
      ORDER BY step""",

    // argmin/argmax by (ts, event_id) mirrors the Spark struct min/max
    "q284_attribution" -> """
      WITH e AS (SELECT user_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      conv AS (SELECT user_id, MIN(ts) AS conv_ts FROM e
               WHERE event_type = 'purchase' GROUP BY user_id),
      t AS (SELECT e.user_id, e.event_type, e.ts, e.event_id
            FROM e JOIN conv ON conv.user_id = e.user_id
            WHERE e.event_type <> 'purchase' AND e.ts < conv.conv_ts),
      ft AS (SELECT user_id, event_type FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM t) z WHERE rn = 1),
      lt AS (SELECT user_id, event_type FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                 AS rn
               FROM t) z WHERE rn = 1),
      f AS (SELECT event_type AS channel,
              CAST(COUNT(*) AS BIGINT) AS n_first_touch
            FROM ft GROUP BY 1),
      l AS (SELECT event_type AS channel,
              CAST(COUNT(*) AS BIGINT) AS n_last_touch
            FROM lt GROUP BY 1)
      SELECT COALESCE(f.channel, l.channel) AS channel,
        COALESCE(f.n_first_touch, 0) AS n_first_touch,
        COALESCE(l.n_last_touch, 0) AS n_last_touch
      FROM f FULL OUTER JOIN l ON l.channel = f.channel
      ORDER BY channel""",

    // epoch-day dow arithmetic ((d+4) mod 7), independence-model
    // expected counts, residuals on the rounded expected value
    "q285_seasonality" -> """
      WITH c AS (
        SELECT CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
            - DATE '1970-01-01' + 4) % 7 AS INT) AS dow,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY dow, hr),
      r AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS row_n
            FROM c GROUP BY dow),
      co AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS col_n
             FROM c GROUP BY hr),
      g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM c),
      x AS (
        SELECT c.dow, c.hr, c.n,
          ROUND(CAST(r.row_n * co.col_n AS DOUBLE)
            / CAST(g.grand AS DOUBLE), 9) AS expected
        FROM c JOIN r USING (dow) JOIN co USING (hr) CROSS JOIN g)
      SELECT dow, hr, n, expected,
        ROUND((CAST(n AS DOUBLE) - expected) / sqrt(expected), 9)
          AS pearson_resid
      FROM x ORDER BY dow, hr""",

    // LEAD over (ts, event_id) mirrors the Spark window; entropy terms
    // round at 9 then decimal-sum
    "q286_transition_matrix" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type AS cur FROM events),
      pr AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT cur, LEAD(cur) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS nxt
               FROM e) z
             WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      r AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS row_n
            FROM pr GROUP BY cur),
      wp AS (SELECT pr.cur, pr.nxt, pr.n,
               ROUND(CAST(pr.n AS DOUBLE) / CAST(r.row_n AS DOUBLE), 9)
                 AS p
             FROM pr JOIN r USING (cur)),
      en AS (SELECT cur,
               ROUND(CAST(SUM(CAST(ROUND(-p * ln(p), 9)
                 AS DECIMAL(28,9))) AS DOUBLE), 9) AS row_entropy
             FROM wp GROUP BY cur)
      SELECT wp.cur, wp.nxt, wp.n, wp.p, en.row_entropy
      FROM wp JOIN en USING (cur) ORDER BY wp.cur, wp.nxt""",

    // survival as exp of the running decimal sum of 9-rounded log
    // factors — an order-independent cumulative product
    "q287_kaplan_meier" -> """
      WITH u AS (SELECT user_id,
          CAST(CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d0,
          CAST(CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d1
        FROM events GROUP BY user_id),
      h AS (SELECT MAX(d1) AS dmax FROM u),
      lv AS (SELECT d1 - d0 AS t,
               CASE WHEN d1 < h.dmax - 3 THEN 1 ELSE 0 END AS death
             FROM u CROSS JOIN h),
      bt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_leaving,
               CAST(SUM(death) AS BIGINT) AS d
             FROM lv GROUP BY t),
      w AS (SELECT t, n_leaving, d,
              CAST(SUM(n_leaving) OVER (ORDER BY t ROWS BETWEEN
                CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                AS n_at_risk
            FROM bt),
      l AS (SELECT *, CASE WHEN d > 0 THEN
              ROUND(ln(1.0 - CAST(d AS DOUBLE)
                / CAST(n_at_risk AS DOUBLE)), 9)
              ELSE 0.0 END AS lnf FROM w)
      SELECT t AS t_days, n_at_risk, d AS n_deaths,
        n_leaving - d AS n_censored,
        ROUND(exp(CAST(SUM(CAST(lnf AS DECIMAL(28,9))) OVER (
          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DOUBLE)), 9) AS survival
      FROM l ORDER BY t_days""",

    // q38's 30-minute gap rule inline; ordered string_agg mirrors the
    // Spark rank-filtered sorted-struct join
    "q288_top_paths" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type FROM events),
      s AS (SELECT *, CASE WHEN prev_ts IS NULL
              OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
            FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_ts FROM e) z),
      sid AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS session_id
              FROM s),
      rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id,
               session_id ORDER BY ts, event_id) AS rn
             FROM sid),
      p AS (SELECT user_id, session_id,
              string_agg(event_type, '>' ORDER BY rn) AS path
            FROM rn WHERE rn <= 3 GROUP BY user_id, session_id)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM p GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 10""",

    // prefix filtering is recall-complete, so the oracle is the naive
    // all-pairs Jaccard definition the engine never runs
    "q289_prefix_jaccard" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      j AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM j
      WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",

    "q290_band_recall" -> bandRecallOracle,

    // PMI marginals counted over the bigram event space on BOTH sides
    // (left-position / right-position counts), min-support 5
    "q291_pmi_collocations" -> """
      WITH wrd AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ',
          'g')), ' ') AS w
        FROM documents),
      d2 AS (SELECT w FROM wrd WHERE len(w) >= 2),
      bg AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
        FROM d2),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
      c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
      n AS (SELECT COUNT(*) AS n_bg FROM bg)
      SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
        ROUND(ln(CAST(p.c12 AS DOUBLE) * CAST(n.n_bg AS DOUBLE) /
          (CAST(c1.c1 AS DOUBLE) * CAST(c2.c2 AS DOUBLE))), 9) AS pmi
      FROM c12 p
      JOIN c1 ON c1.w1 = p.w1
      JOIN c2 ON c2.w2 = p.w2
      CROSS JOIN n
      WHERE p.c12 >= 5
      ORDER BY pmi DESC, p.w1, p.w2 LIMIT 20""",

    // basket = distinct parts of one order; min-support 3 co-orders
    "q292_market_basket" -> """
      WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
      it AS (SELECT l_partkey, COUNT(*) AS c_item FROM b
             GROUP BY l_partkey),
      p AS (
        SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
          COUNT(*) AS c_ab
        FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
          AND a.l_partkey < b2.l_partkey
        GROUP BY 1, 2)
      SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS c_ab,
        ROUND(CAST(c_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 9)
          AS support,
        ROUND(CAST(c_ab AS DOUBLE) / CAST(ia.c_item AS DOUBLE), 9)
          AS confidence,
        ROUND(CAST(c_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE) /
          (CAST(ia.c_item AS DOUBLE) * CAST(ib.c_item AS DOUBLE)), 9)
          AS lift
      FROM p
      JOIN it ia ON ia.l_partkey = p.part_a
      JOIN it ib ON ib.l_partkey = p.part_b
      CROSS JOIN n
      WHERE c_ab >= 3
      ORDER BY lift DESC, part_a, part_b LIMIT 20""",

    // spread/median rounds at 9 BEFORE the 0.5 compare on both sides
    // so boundary classification is engine-portable
    "q293_bot_profile" -> """
      WITH g AS (
        SELECT user_id,
          CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
            / 1000000.0 AS gap
        FROM events),
      s AS (
        SELECT user_id, COUNT(gap) AS n_gaps,
          quantile_cont(gap, 0.5) AS med,
          quantile_cont(gap, 0.9) - quantile_cont(gap, 0.1) AS spread
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap) >= 4),
      c AS (
        SELECT n_gaps + 1 AS n_events, med,
          CASE WHEN med <= 0 THEN 'burst'
               WHEN ROUND(spread / med, 9) < 0.5 THEN 'regular'
               ELSE 'organic' END AS behavior
        FROM s)
      SELECT behavior, COUNT(*) AS n_users,
        CAST(SUM(n_events) AS BIGINT) AS n_events,
        ROUND(quantile_cont(med, 0.5), 9) AS median_of_median_gap_s
      FROM c GROUP BY behavior ORDER BY behavior""",

    "q274_dim_ablation" -> dimAblationOracle,

    "q275_effective_mixture" -> effectiveMixtureOracle,

    // all-pairs match relation (= q230's blocked join), adjacent-key
    // non-match sample, add-one smoothing, log2 on the rounded probs
    "q276_linkage_weights" -> """
      WITH m AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1),
      attrs AS (
        SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
        FROM customer),
      np AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM attrs a JOIN attrs b ON b.id = a.id + 1
        WHERE NOT EXISTS (SELECT 1 FROM m
          WHERE m.id_a = a.id AND m.id_b = b.id)),
      ma AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_m,
          CAST(SUM(CASE WHEN x.nat = y.nat THEN 1 ELSE 0 END) AS BIGINT)
            AS nat_m,
          CAST(SUM(CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END) AS BIGINT)
            AS seg_m,
          CAST(SUM(CASE WHEN x.band = y.band THEN 1 ELSE 0 END) AS BIGINT)
            AS band_m
        FROM m JOIN attrs x ON x.id = m.id_a
        JOIN attrs y ON y.id = m.id_b),
      ua AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_u,
          CAST(SUM(CASE WHEN x.nat = y.nat THEN 1 ELSE 0 END) AS BIGINT)
            AS nat_u,
          CAST(SUM(CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END) AS BIGINT)
            AS seg_u,
          CAST(SUM(CASE WHEN x.band = y.band THEN 1 ELSE 0 END) AS BIGINT)
            AS band_u
        FROM np JOIN attrs x ON x.id = np.id_a
        JOIN attrs y ON y.id = np.id_b),
      f AS (
        SELECT 'bal_band' AS field, band_m AS agree_m, band_u AS agree_u,
          n_m, n_u FROM ma CROSS JOIN ua
        UNION ALL SELECT 'nation', nat_m, nat_u, n_m, n_u
          FROM ma CROSS JOIN ua
        UNION ALL SELECT 'segment', seg_m, seg_u, n_m, n_u
          FROM ma CROSS JOIN ua)
      SELECT field, n_m AS n_match_pairs, agree_m AS agree_match,
        n_u AS n_nonmatch_pairs, agree_u AS agree_nonmatch,
        ROUND(CAST(agree_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE), 9)
          AS m_prob,
        ROUND(CAST(agree_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE), 9)
          AS u_prob,
        ROUND(log2(
          ROUND(CAST(agree_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE), 9)
          / ROUND(CAST(agree_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE),
              9)), 9) AS weight
      FROM f ORDER BY field""",

    // persisted vector-index lifecycle: probes must equal re-deriving
    // the deterministic model in SQL — q294 trains on the full corpus,
    // q295 trains on the base slice and assigns everyone (append under
    // a frozen model == rebuild under the same model)
    "q294_ivf_persisted" -> ivfProbeOracle(""),
    "q295_ivf_append" -> ivfProbeOracle("WHERE vec_id % 10 <> 7"),
    "q296_pq_persisted" -> pqPersistedOracle,
    "q297_simhash_recall" -> simhashRecallOracle,
  )

  /** The shared two-round Lloyd CTE chain of q248/q249 (`a2` = final
    * assignment). Kept as one string so both oracles iterate from the
    * same seed and rounding discipline as `Similarity.kmeansAssigned`. */
  private val kmeansCtes: String = """
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM e ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1)"""

  /** q294/q295's oracle: retrain the deterministic Lloyd model the
    * persisted IVF index was built from (seed = 8 lowest vec_ids of
    * the TRAIN slice, one refinement, 9-rounded distances/means —
    * Similarity.centersOf), assign the FULL corpus against those
    * centers (append must be invisible under the frozen model), pick
    * each probe's 2 nearest cells by 9-rounded centroid distance
    * (tie-break lowest cid, mirroring lloydAssign's first-min), and
    * rank exact 9-rounded cosine inside the probed cells. */
  private def ivfProbeOracle(trainWhere: String): String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      et AS (SELECT vec_id, v FROM e $trainWhere),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1),
      pr AS (SELECT vec_id AS q_id, v AS pv FROM e WHERE vec_id < 5),
      pc AS (
        SELECT q_id, pv, cid FROM (
          SELECT p.q_id, p.pv, c.cid,
            row_number() OVER (PARTITION BY p.q_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(p.pv, c.c),
                t -> (t[1]-t[2])*(t[1]-t[2])), (a,b) -> a + b), 9),
              c.cid) AS rn
          FROM pr p CROSS JOIN c1 c)
        WHERE rn <= 2),
      cand AS (
        SELECT pc.q_id, a.vec_id,
          ROUND(
            list_reduce(list_transform(list_zip(pc.pv, a.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(pc.pv, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(a.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM a2 a JOIN pc ON a.cid = pc.cid AND a.vec_id <> pc.q_id)
      SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 3 ORDER BY q_id, rank"""

  /** One PQ subspace's deterministic codebook + encoding chain: the
    * Lloyd template (seed = 8 lowest vec_id SLICES, one refinement,
    * 9-rounded), run on list_slice(v, o+1, o+16). */
  private def pqSubspaceCtes(s: Int): String = {
    val lo = s * 16 + 1
    val hi = s * 16 + 16
    s"""
      es$s AS (SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM e),
      sd$s AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM es$s ORDER BY vec_id LIMIT 8),
      pd$s AS (
        SELECT t.vec_id, t.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM es$s t CROSS JOIN sd$s s),
      pa$s AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM pd$s)
        WHERE rn = 1),
      cb$s AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(u.pos AS INT) AS pos, ROUND(AVG(u.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 17),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS u
                 FROM pa$s)
           GROUP BY cid, pos)
        GROUP BY cid),
      en$s AS (
        SELECT vec_id, cid AS code FROM (
          SELECT t.vec_id, s.cid,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
          FROM es$s t CROSS JOIN cb$s s)
        WHERE rn = 1)"""
  }

  /** q296's oracle: the four subspace codebook/encode chains, the ADC
    * grid (probe × subspace × code, 9-rounded sub-distances summed as
    * exact decimals), top-20 shortlist by approximate distance, exact
    * cosine re-rank of the shortlist. */
  private def pqPersistedOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      ${(0 until 4).map(pqSubspaceCtes).mkString(",")},
      cbs AS (
        ${(0 until 4).map(s =>
          s"SELECT $s AS s, cid AS code, c FROM cb$s")
          .mkString("\n        UNION ALL ")}),
      cds AS (
        ${(0 until 4).map(s =>
          s"SELECT vec_id, $s AS s, code FROM en$s")
          .mkString("\n        UNION ALL ")}),
      pr AS (SELECT vec_id AS q_id, v AS pv FROM e WHERE vec_id < 5),
      grid AS (
        SELECT p.q_id, b.s, b.code,
          ROUND(list_reduce(list_transform(list_zip(
            list_slice(p.pv, b.s * 16 + 1, b.s * 16 + 16), b.c),
            t -> (t[1]-t[2])*(t[1]-t[2])), (x,y) -> x + y), 9) AS d
        FROM pr p CROSS JOIN cbs b),
      ap AS (
        SELECT g.q_id, c.vec_id,
          CAST(SUM(CAST(g.d AS DECIMAL(28,9))) AS DOUBLE) AS approx_d
        FROM cds c JOIN grid g ON g.s = c.s AND g.code = c.code
        WHERE c.vec_id <> g.q_id
        GROUP BY g.q_id, c.vec_id),
      sl AS (
        SELECT q_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY approx_d, vec_id) AS crank FROM ap)
        WHERE crank <= 20),
      cand AS (
        SELECT sl.q_id, sl.vec_id,
          ROUND(
            list_reduce(list_transform(list_zip(p.pv, e.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(p.pv, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(e.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM sl
        JOIN e ON e.vec_id = sl.vec_id
        JOIN pr p ON p.q_id = sl.q_id)
      SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 3 ORDER BY q_id, rank"""

  /** q297's oracle: the exact J ≥ 0.8 relation (q289's definition)
    * against the md5-portable SimHash pair set — per-token 64-bit
    * hash from md5's first 8 bytes (bit j = in-nibble bit j%4 of hex
    * char 16 − j/4), sign-of-sum sketch, 4×16-bit chunk pigeonhole
    * candidates, hamming ≤ 3 verify — aggregated to per-Jaccard-band
    * recall. */
  private def simhashRecallOracle: String = """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      exf AS (
        SELECT doc_a, doc_b,
          LEAST(CAST(floor(jaccard * 20.0) AS BIGINT), 19) AS band
        FROM ex WHERE jaccard >= 0.8),
      tok AS (SELECT doc_id, unnest(w) AS t FROM words
              WHERE len(w) >= 1),
      bitsum AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (((strpos('0123456789abcdef',
              substring(md5(t), CAST(16 - (j // 4) AS INT), 1)) - 1)
              >> CAST(j % 4 AS INT)) & 1) = 1
            THEN 1 ELSE -1 END) AS csum
        FROM tok CROSS JOIN (SELECT unnest(range(64)) AS j)
        GROUP BY doc_id, j),
      sk AS (
        SELECT doc_id,
          list(CASE WHEN csum > 0 THEN 1 ELSE 0 END ORDER BY j) AS b
        FROM bitsum GROUP BY doc_id),
      ck AS (
        SELECT doc_id, b, ch,
          list_reduce(list_transform(range(16),
            i -> b[CAST(ch * 16 + i + 1 AS INT)]
              * (1 << CAST(i AS INT))),
            (x, y) -> x + y) AS chunk_val
        FROM sk CROSS JOIN (SELECT unnest(range(4)) AS ch)),
      sp AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM ck x JOIN ck y ON x.ch = y.ch
          AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id),
      sf AS (
        SELECT p.doc_a, p.doc_b FROM sp p
        JOIN sk xa ON xa.doc_id = p.doc_a
        JOIN sk yb ON yb.doc_id = p.doc_b
        WHERE list_reduce(list_transform(list_zip(xa.b, yb.b),
          u -> abs(u[1] - u[2])), (x, y) -> x + y) <= 3)
      SELECT CAST(band AS DOUBLE) / 20.0 AS band_lo,
        CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN sf.doc_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_simhash,
        ROUND(CAST(SUM(CASE WHEN sf.doc_a IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS recall
      FROM exf LEFT JOIN sf ON sf.doc_a = exf.doc_a
        AND sf.doc_b = exf.doc_b
      GROUP BY band ORDER BY band_lo"""

  /** Shared oracle of the streaming admission gate (q217 unbounded /
    * q237 watermark-bounded): new-vs-corpus banded candidates with the
    * exact-Jaccard verify — state bounding must not change the
    * admitted set. */
  private def streamGateOracle: String = """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM bands n
        JOIN bands o ON n.band = o.band AND n.band_key = o.band_key
        WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 <> 7)
      SELECT doc_new, doc_old,
        ROUND(CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE), 9)
          AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_new
      JOIN sh y ON y.doc_id = doc_old
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_new, doc_old"""

  private val curationPipelineOracle: String = """
      WITH RECURSIVE train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
      tok AS (
        SELECT doc_id, text,
          len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS n
        FROM train),
      s1 AS (SELECT doc_id, text FROM tok WHERE n BETWEEN 20 AND 100000),
      fp AS (
        SELECT doc_id, text,
          MIN(doc_id) OVER (PARTITION BY
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
            AS min_id
        FROM s1),
      s2 AS (SELECT doc_id, text FROM fp WHERE doc_id = min_id),
      words2 AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM s2),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words2 WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      drop3 AS (SELECT id AS doc_id FROM labels WHERE label < id),
      s3 AS (SELECT doc_id, text FROM s2
             WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
      gw AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM s3),
      g3 AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM gw WHERE len(w) >= 8),
      ew AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents WHERE doc_id % 10 = 0),
      eg AS (
        SELECT DISTINCT
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM ew WHERE len(w) >= 8),
      contaminated AS (
        SELECT DISTINCT g3.doc_id FROM g3 JOIN eg USING (gram)),
      s4 AS (SELECT doc_id FROM s3
             WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      n AS (
        SELECT (SELECT COUNT(*) FROM train) AS n0,
               (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM s3) AS n3,
               (SELECT COUNT(*) FROM s4) AS n4)
      SELECT CAST(stage AS INT) AS stage, gate,
        CAST(n_entering AS BIGINT) AS n_entering,
        CAST(n_dropped AS BIGINT) AS n_dropped,
        CAST(n_surviving AS BIGINT) AS n_surviving
      FROM (
        SELECT 1 AS stage, 'quality_length' AS gate, n0 AS n_entering,
               n0 - n1 AS n_dropped, n1 AS n_surviving FROM n
        UNION ALL SELECT 2, 'exact_dedup', n1, n1 - n2, n2 FROM n
        UNION ALL SELECT 3, 'near_dedup', n2, n2 - n3, n3 FROM n
        UNION ALL SELECT 4, 'decontamination', n3, n3 - n4, n4 FROM n) r
      ORDER BY stage"""

  private val shardManifestOracle: String = """
      WITH s AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
            ::INTEGER % 16 AS shard,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      m AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(tokens) AS BIGINT) AS n_tokens
        FROM s GROUP BY shard),
      t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM m)
      SELECT shard, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) * 16.0 / CAST(tot AS DOUBLE) AS balance
      FROM m CROSS JOIN t
      ORDER BY shard"""

  private val clusterDownweightOracle: String = """
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      tok AS (
        SELECT doc_id,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      lab AS (
        SELECT t.doc_id, t.tokens, l.label
        FROM tok t LEFT JOIN labels l ON l.id = t.doc_id),
      clusters AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(tokens) AS BIGINT) AS cluster_tokens,
          CAST(MAX(CASE WHEN doc_id = label THEN tokens END) AS BIGINT)
            AS rep_tokens
        FROM lab WHERE label IS NOT NULL GROUP BY label),
      paired AS (
        SELECT k AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(SUM(cluster_tokens) AS BIGINT) AS tokens_total,
          CAST(SUM(rep_tokens) AS BIGINT) AS tokens_keep_one
        FROM clusters GROUP BY k),
      single AS (
        SELECT CAST(1 AS BIGINT) AS cluster_size,
          CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(SUM(tokens) AS BIGINT) AS tokens_total,
          CAST(SUM(tokens) AS BIGINT) AS tokens_keep_one
        FROM lab WHERE label IS NULL),
      u AS (SELECT * FROM single UNION ALL SELECT * FROM paired)
      SELECT cluster_size, n_clusters,
        cluster_size * n_clusters AS n_docs,
        tokens_total, tokens_keep_one,
        CAST(tokens_total AS DOUBLE) / CAST(cluster_size AS DOUBLE)
          AS tokens_effective
      FROM u
      ORDER BY cluster_size"""

  /** q69's oracle (cluster summary over the full near-dup graph);
    * q242's incremental update must reproduce it bit-for-bit. */
  private val dedupClustersOracle: String =
    ccLabelCtes + """
      SELECT label AS cluster, COUNT(*) AS n_docs, MAX(id) AS max_doc
      FROM labels
      GROUP BY label
      ORDER BY cluster"""

  /** The shared CTE chain ending in `labels(id, label)` (min-label
    * transitive closure over the verified near-dup edges) and `edges`
    * — q69/q242's component labels, reused by q270's split repair. */
  private def ccLabelCtes: String = """
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)"""

  /** q151's BM25 scoring chain ending in `lexs(doc_id, bm25,
    * n_terms_hit)` — shared with the hybrid rank fusion (q280). */
  private val bm25Ctes: String = """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM w2 GROUP BY doc_id),
      st AS (SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
      tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM w2
        WHERE word IN ('the', 'data', 'model')
        GROUP BY doc_id, word),
      df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
      sc AS (
        SELECT tf.doc_id,
          CAST(ROUND(
            ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
               / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
            * (CAST(tf AS DOUBLE) * 2.2)
            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
               * CAST(dl AS DOUBLE)
               / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
            9) AS DECIMAL(18,9)) AS s
        FROM tf JOIN df USING (word) JOIN dl USING (doc_id)
        CROSS JOIN st),
      lexs AS (
        SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25,
          COUNT(*) AS n_terms_hit
        FROM sc GROUP BY doc_id)"""

  /** Shared by q273 (batch) and q277 (streamed aggregate, identical
    * finishing math): integer-scaled CUSUM with the deterministic
    * argmax tie-break. */
  private val cusumOracle: String = """
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, day),
      tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS s
        FROM daily GROUP BY event_type),
      w AS (
        SELECT d.event_type, d.day, t.n, t.s,
          CAST(ROW_NUMBER() OVER pw AS BIGINT) AS t_idx,
          CAST(SUM(d.x) OVER pw AS BIGINT) AS cum
        FROM daily d JOIN tot t ON t.event_type = d.event_type
        WINDOW pw AS (PARTITION BY d.event_type ORDER BY d.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      sc AS (
        SELECT event_type, day, n, s, t_idx, cum,
          n * cum - t_idx * s AS ss
        FROM w),
      best AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY ABS(ss) DESC, t_idx ASC) AS rn
          FROM sc) q WHERE rn = 1)
      SELECT event_type, n AS n_days, CAST(day AS VARCHAR) AS cp_day,
        ROUND(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 9) AS cusum,
        ROUND(CAST(cum AS DOUBLE) / CAST(t_idx AS DOUBLE), 9) AS pre_mean,
        CASE WHEN n > t_idx THEN
          ROUND(CAST(s - cum AS DOUBLE) / CAST(n - t_idx AS DOUBLE), 9)
        END AS post_mean
      FROM best ORDER BY event_type"""

  /** q279's oracle: the CC chain supplies bands and labels; chunk
    * counts reuse q263's per-doc chunk-grid formula; every artifact's
    * deleted/after/residual counts recompute from the kept rows. */
  private def deletionPropagationOracle: String =
    ccLabelCtes + """,
      dl AS (SELECT doc_id FROM documents WHERE doc_id % 101 = 0),
      chk AS (
        SELECT doc_id,
          CAST(1 + (greatest(CAST(len(string_split(trim(regexp_replace(
            lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) - 64, 0)
            + 47) // 48 AS BIGINT) AS n_chunks
        FROM documents),
      kb AS (SELECT doc_id FROM bands
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kc AS (SELECT doc_id, n_chunks FROM chk
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kd AS (SELECT doc_id FROM documents
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kl AS (SELECT id, label FROM labels
             WHERE id NOT IN (SELECT doc_id FROM dl))
      SELECT * FROM (
        SELECT 'bands' AS artifact,
          CAST((SELECT COUNT(*) FROM bands) AS BIGINT) AS rows_before,
          CAST((SELECT COUNT(*) FROM bands)
            - (SELECT COUNT(*) FROM kb) AS BIGINT) AS rows_deleted,
          CAST((SELECT COUNT(*) FROM kb) AS BIGINT) AS rows_after,
          CAST((SELECT COUNT(*) FROM kb JOIN dl
            ON kb.doc_id = dl.doc_id) AS BIGINT) AS residual_refs,
          CAST(0 AS BIGINT) AS n_stale
        UNION ALL
        SELECT 'chunks',
          CAST((SELECT SUM(n_chunks) FROM chk) AS BIGINT),
          CAST((SELECT SUM(n_chunks) FROM chk)
            - (SELECT SUM(n_chunks) FROM kc) AS BIGINT),
          CAST((SELECT SUM(n_chunks) FROM kc) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kc JOIN dl
            ON kc.doc_id = dl.doc_id) AS BIGINT),
          CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'corpus',
          CAST((SELECT COUNT(*) FROM documents) AS BIGINT),
          CAST((SELECT COUNT(*) FROM documents)
            - (SELECT COUNT(*) FROM kd) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kd) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kd JOIN dl
            ON kd.doc_id = dl.doc_id) AS BIGINT),
          CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'labels',
          CAST((SELECT COUNT(*) FROM labels) AS BIGINT),
          CAST((SELECT COUNT(*) FROM labels)
            - (SELECT COUNT(*) FROM kl) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl JOIN dl
            ON kl.id = dl.doc_id) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl JOIN dl
            ON kl.label = dl.doc_id) AS BIGINT)) u
      ORDER BY artifact"""

  /** q280's oracle: BM25 arm (shared CTEs), exact-cosine arm against
    * probe vector 0, reciprocal-rank fusion with the same rounding. */
  private def rankFusionOracle: String = {
    def dotSql(a: String, b: String): String =
      s"""list_reduce(list_transform(range(1, 65),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    bm25Ctes + s""",
      lex AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC,
          doc_id) AS INT) AS rank_lex
        FROM (SELECT doc_id, bm25 FROM lexs
              ORDER BY bm25 DESC, doc_id LIMIT 20) t),
      pr AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      semsc AS (
        SELECT e.vec_id AS doc_id,
          ${dotSql("q_emb", "e.embedding")}
          / sqrt(${dotSql("q_emb", "q_emb")}
            * ${dotSql("e.embedding", "e.embedding")}) AS cos
        FROM embeddings e CROSS JOIN pr
        WHERE e.vec_id <> 0),
      sem AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC,
          doc_id) AS INT) AS rank_sem
        FROM (SELECT doc_id, cos FROM semsc
              ORDER BY cos DESC, doc_id LIMIT 20) t),
      fused AS (
        SELECT COALESCE(l.doc_id, s2.doc_id) AS doc_id,
          l.rank_lex, s2.rank_sem,
          ROUND(COALESCE(ROUND(1.0 / (60.0 + l.rank_lex), 9), 0.0)
            + COALESCE(ROUND(1.0 / (60.0 + s2.rank_sem), 9), 0.0), 9)
            AS rrf
        FROM lex l FULL OUTER JOIN sem s2 ON s2.doc_id = l.doc_id)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT)
          AS fused_rank,
        doc_id, rank_lex, rank_sem, rrf
      FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10) t
      ORDER BY fused_rank"""
  }

  /** q281's oracle: the q274 CTE template with ranks kept, DCG@10
    * against the full-dim anchor, the ideal DCG derived by the same
    * formula from a 10-row range. */
  private def ndcgAblationOracle: String = {
    def dotSql(a: String, b: String, d: Int): String =
      s"""list_reduce(list_transform(range(1, ${d + 1}),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    val variants = Seq(16, 32, 64).map { d =>
      s"""      s$d AS (
        SELECT q_id, e.vec_id,
          ${dotSql("q_emb", "e.embedding", d)}
          / sqrt(${dotSql("q_emb", "q_emb", d)}
            * ${dotSql("e.embedding", "e.embedding", d)}) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id),
      t$d AS (
        SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
          SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS rn
          FROM s$d) z WHERE rn <= 10)"""
    }.mkString(",\n")
    val per = Seq(16, 32).map { d =>
      s"""      dcg$d AS (
        SELECT t$d.q_id,
          CAST(SUM(CAST(ROUND(1.0 / log2(CAST(t$d.rank AS DOUBLE) + 1.0),
            9) AS DECIMAL(28,9))) AS DOUBLE) AS dcg
        FROM t$d JOIN t64 ON t64.q_id = t$d.q_id
          AND t64.vec_id = t$d.vec_id
        GROUP BY t$d.q_id),
      nd$d AS (
        SELECT qq.q_id, ROUND(COALESCE(dd.dcg, 0.0) / i.idcg, 9) AS ndcg
        FROM (SELECT DISTINCT q_id FROM t64) qq
        LEFT JOIN dcg$d dd ON dd.q_id = qq.q_id
        CROSS JOIN idcg i),
      a$d AS (
        SELECT $d AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
          ROUND(CAST(SUM(CAST(ndcg AS DECIMAL(28,9))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 9) AS mean_ndcg,
          MIN(ndcg) AS min_ndcg
        FROM nd$d)"""
    }.mkString(",\n")
    s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 20),
$variants,
      idcg AS (
        SELECT CAST(SUM(CAST(ROUND(1.0 / log2(CAST(i AS DOUBLE) + 1.0),
          9) AS DECIMAL(28,9))) AS DOUBLE) AS idcg
        FROM (SELECT unnest(range(1, 11)) AS i) r),
$per
      SELECT CAST(dim AS INT) AS dim, n_queries, mean_ndcg, min_ndcg
      FROM (SELECT * FROM a16 UNION ALL SELECT * FROM a32) u
      ORDER BY dim"""
  }

  /** q274's oracle: the q27 cosine CTE template instantiated per dim
    * variant (the dot/norm folds range only over the first d dims =
    * the slice), recall joined against the 64-dim anchor. */
  private def dimAblationOracle: String = {
    def dotSql(a: String, b: String, d: Int): String =
      s"""list_reduce(list_transform(range(1, ${d + 1}),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    val variants = Seq(16, 32, 64).map { d =>
      s"""      s$d AS (
        SELECT q_id, e.vec_id,
          ${dotSql("q_emb", "e.embedding", d)}
          / sqrt(${dotSql("q_emb", "q_emb", d)}
            * ${dotSql("e.embedding", "e.embedding", d)}) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id),
      t$d AS (
        SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS rn
          FROM s$d) z WHERE rn <= 10)"""
    }.mkString(",\n")
    val recalls = Seq(16, 32).map { d =>
      s"""      r$d AS (
        SELECT qq.q_id, COALESCE(i.cnt, 0) AS hits
        FROM (SELECT DISTINCT q_id FROM t64) qq
        LEFT JOIN (
          SELECT t$d.q_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM t$d JOIN t64 ON t64.q_id = t$d.q_id
            AND t64.vec_id = t$d.vec_id
          GROUP BY t$d.q_id) i ON i.q_id = qq.q_id),
      a$d AS (
        SELECT $d AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
          CAST(SUM(hits) AS BIGINT) AS total_hits,
          CAST(MIN(hits) AS BIGINT) AS min_hits
        FROM r$d)"""
    }.mkString(",\n")
    s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 20),
$variants,
$recalls
      SELECT CAST(dim AS INT) AS dim, n_queries, total_hits,
        ROUND(CAST(total_hits AS DOUBLE)
          / CAST(n_queries * 10 AS DOUBLE), 9) AS mean_recall,
        ROUND(CAST(min_hits AS DOUBLE) / 10.0, 9) AS min_recall
      FROM (SELECT * FROM a16 UNION ALL SELECT * FROM a32) u
      ORDER BY dim"""
  }

  /** q275's oracle: the shared CC label chain plus the per-(lang, k)
    * effective-mass roll-up mirroring the Spark rounding discipline. */
  private def effectiveMixtureOracle: String =
    ccLabelCtes + """,
      tokl AS (
        SELECT doc_id, lang,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      sizes AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS k
        FROM labels GROUP BY label),
      lab AS (
        SELECT t.lang, t.tokens, COALESCE(s.k, 1) AS k
        FROM tokl t
        LEFT JOIN labels l ON l.id = t.doc_id
        LEFT JOIN sizes s ON s.label = l.label),
      bylk AS (
        SELECT lang, k, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(tokens) AS BIGINT) AS tok
        FROM lab GROUP BY lang, k),
      pl AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(tok) AS BIGINT) AS raw_tokens,
          SUM(CAST(ROUND(CAST(tok AS DOUBLE) / CAST(k AS DOUBLE), 9)
            AS DECIMAL(28,9))) AS eff_dec
        FROM bylk GROUP BY lang),
      tt AS (SELECT CAST(SUM(raw_tokens) AS BIGINT) AS raw_total,
                    SUM(eff_dec) AS eff_total FROM pl)
      SELECT lang, n_docs, raw_tokens,
        ROUND(CAST(eff_dec AS DOUBLE), 9) AS eff_tokens,
        ROUND(CAST(raw_tokens AS DOUBLE) / CAST(raw_total AS DOUBLE), 9)
          AS raw_share,
        ROUND(CAST(eff_dec AS DOUBLE) / CAST(eff_total AS DOUBLE), 9)
          AS eff_share,
        ROUND(ROUND(CAST(eff_dec AS DOUBLE) / CAST(eff_total AS DOUBLE), 9)
          - ROUND(CAST(raw_tokens AS DOUBLE) / CAST(raw_total AS DOUBLE),
              9), 9) AS share_shift
      FROM pl CROSS JOIN tt ORDER BY lang"""

  /** q290's oracle: the exact all-pairs J ≥ 0.8 relation banded into
    * 0.05-wide cells, left-joined against the CC chain's verified
    * banded `edges` (= q25's pair set). */
  private def bandRecallOracle: String =
    ccLabelCtes + """,
      ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      exf AS (
        SELECT doc_a, doc_b,
          LEAST(CAST(floor(jaccard * 20.0) AS BIGINT), 19) AS band
        FROM ex WHERE jaccard >= 0.8),
      bd AS (SELECT doc_a, doc_b FROM edges)
      SELECT CAST(band AS DOUBLE) / 20.0 AS band_lo,
        CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN bd.doc_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_found,
        ROUND(CAST(SUM(CASE WHEN bd.doc_a IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS recall
      FROM exf LEFT JOIN bd ON bd.doc_a = exf.doc_a
        AND bd.doc_b = exf.doc_b
      GROUP BY band ORDER BY band_lo"""

  /** q270's oracle: majority-split repair over the q69 labels. The
    * row_number tie-break (cnt desc, then train < val < test) mirrors
    * the Spark side's max(struct(cnt, prio, split)) argmax; the
    * post-repair cross-pair count recomputes from `edges`, the same
    * verified edge list the labels came from. */
  private val splitRepairOracle: String =
    ccLabelCtes + """,
      spl AS (
        SELECT doc_id,
          CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split
        FROM documents),
      cs AS (
        SELECT l.label, s.split, CAST(count(*) AS BIGINT) AS cnt
        FROM labels l JOIN spl s ON l.id = s.doc_id
        GROUP BY l.label, s.split),
      maj AS (
        SELECT label, split AS split_after FROM (
          SELECT label, split,
            row_number() OVER (PARTITION BY label ORDER BY cnt DESC,
              CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1
                ELSE 2 END) AS rn
          FROM cs) t
        WHERE rn = 1),
      fin AS (
        SELECT s.doc_id, s.split AS split_before,
          COALESCE(m.split_after, s.split) AS split_after,
          l.label IS NOT NULL AS clustered
        FROM spl s
        LEFT JOIN labels l ON l.id = s.doc_id
        LEFT JOIN maj m ON l.label = m.label),
      xp AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN a.split_after <>
            b.split_after THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS cross_pairs_after
        FROM edges e
        JOIN fin a ON e.doc_a = a.doc_id
        JOIN fin b ON e.doc_b = b.doc_id)
      SELECT clustered, split_before, split_after,
        CAST(count(*) AS BIGINT) AS n_docs, xp.cross_pairs_after
      FROM fin CROSS JOIN xp
      GROUP BY clustered, split_before, split_after,
        xp.cross_pairs_after
      ORDER BY clustered, split_before, split_after"""

  /** q243's oracle: three GENERATED BPE rounds (the q150 template
    * discipline — a typo can't hide in hand-copied round blocks).
    * Each round: weighted adjacent-pair count over the current
    * vocabulary, argmax with the count-desc/left-asc/right-asc
    * tie-break, then the space-delimited replace whose left-to-right
    * non-overlapping scan both engines share. */
  /** Shared CTE chain for the BPE pair (q243 train / q267 encode):
    * word stream, symbolized vocabulary, and the three training
    * rounds (p_k pair counts, b_k argmax with the deterministic
    * tie-break, v_k merged vocabulary). */
  private def bpeCtes: String = {
    val rounds = (1 to 3).map { k =>
      s"""      p$k AS (
        SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
          SELECT freq,
            unnest(list_transform(range(1, len(a)), i -> a[i])) AS l,
            unnest(list_transform(range(1, len(a)), i -> a[i+1])) AS r
          FROM (SELECT string_split(trim(s), ' ') AS a, freq
                FROM v${k - 1}) t
          WHERE len(a) >= 2) q
        GROUP BY l, r),
      b$k AS (SELECT * FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
      v$k AS (SELECT replace(v${k - 1}.s,
                ' ' || b$k.l || ' ' || b$k.r || ' ',
                ' ' || b$k.l || b$k.r || ' ') AS s, freq
              FROM v${k - 1} CROSS JOIN b$k)"""
    }.mkString(",\n")
    s"""
      WITH wrd AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      v0 AS (
        SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' '
            AS s,
          CAST(COUNT(*) AS BIGINT) AS freq
        FROM wrd WHERE length(w) >= 1 GROUP BY w),
$rounds"""
  }

  private def bpeMergesOracle: String = s"""$bpeCtes
      SELECT CAST(mr AS INT) AS merge_round, l AS lsym, r AS rsym,
        cnt AS pair_count
      FROM (
        SELECT 1 AS mr, l, r, cnt FROM b1
        UNION ALL SELECT 2, l, r, cnt FROM b2
        UNION ALL SELECT 3, l, r, cnt FROM b3) u
      ORDER BY merge_round"""

  /** q267's oracle: replay the three learned merges over every word
    * occurrence (lang carried through), identical replace semantics
    * to the Spark encoder. */
  private def bpeEncodeOracle: String = s"""$bpeCtes,
      wl AS (
        SELECT lang, unnest(string_split(trim(regexp_replace(lower(text),
          '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      base AS (
        SELECT lang, w,
          ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
        FROM wl WHERE length(w) >= 1),
      e1 AS (SELECT lang, w, replace(base.s,
               ' ' || b1.l || ' ' || b1.r || ' ',
               ' ' || b1.l || b1.r || ' ') AS s
             FROM base CROSS JOIN b1),
      e2 AS (SELECT lang, w, replace(e1.s,
               ' ' || b2.l || ' ' || b2.r || ' ',
               ' ' || b2.l || b2.r || ' ') AS s
             FROM e1 CROSS JOIN b2),
      e3 AS (SELECT lang, w, replace(e2.s,
               ' ' || b3.l || ' ' || b3.r || ' ',
               ' ' || b3.l || b3.r || ' ') AS s
             FROM e2 CROSS JOIN b3)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(length(w)) AS BIGINT) AS symbols_before,
        CAST(SUM(len(string_split(trim(s), ' '))) AS BIGINT)
          AS symbols_after,
        CAST(SUM(length(w)) - SUM(len(string_split(trim(s), ' ')))
          AS BIGINT) AS merge_applications,
        ROUND(CAST(SUM(len(string_split(trim(s), ' '))) AS DOUBLE)
          / CAST(SUM(length(w)) AS DOUBLE), 9) AS compression
      FROM e3 GROUP BY lang ORDER BY lang"""

  /** q240's oracle: the three section oracles as verbatim subqueries,
    * tagged and column-aligned exactly like the Spark union. */
  private def roundReportOracle: String = s"""
      SELECT * FROM (
        SELECT 'attrition' AS section, CAST(stage AS BIGINT) AS seq,
          gate AS key, n_entering AS n_a, n_dropped AS n_b,
          n_surviving AS n_c,
          ROUND(CAST(n_surviving AS DOUBLE) / CAST(n_entering AS DOUBLE),
            9) AS metric
        FROM ($curationPipelineOracle)
        UNION ALL
        SELECT 'shard', CAST(shard AS BIGINT), CAST(shard AS VARCHAR),
          n_docs, n_tokens, CAST(NULL AS BIGINT), ROUND(balance, 9)
        FROM ($shardManifestOracle)
        UNION ALL
        SELECT 'downweight', cluster_size, CAST(cluster_size AS VARCHAR),
          n_docs, tokens_total, tokens_keep_one,
          ROUND(tokens_effective, 9)
        FROM ($clusterDownweightOracle))
      ORDER BY section, seq"""

  /** q150's oracle: the shared MinHash edge CTEs plus 10 GENERATED
    * fixed-point iterations — one template, so a typo can't hide in
    * hand-copied CTE blocks (integer div keeps every step exact). */
  private def q150PageRankOracle: String = {
    val iters = (1 to 10).map { k =>
      s"""      it$k AS (
        SELECT n.id, CAST(150000000000
          + (85 * COALESCE(SUM(p.units // d.outdeg), 0)) // 100
          AS BIGINT) AS units
        FROM nodes n
        LEFT JOIN sym e ON e.dst = n.id
        LEFT JOIN it${k - 1} p ON p.id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.id)"""
    }.mkString(",\n")
    s"""
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      it0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS units
              FROM nodes),
$iters
      SELECT id AS doc_id, units AS rank_units
      FROM it10
      ORDER BY rank_units DESC, doc_id
      LIMIT 50"""
  }
}
