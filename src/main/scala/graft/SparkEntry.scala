package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsofJoin, Basket, Changelog, Compaction, CoreOps, EventOps, FuzzyJoin, Profile, RangeJoin, Skew, ZOrder}
import graft.functions.{Decontam, Dedup, Gates, Ivf, Multimodal, Pq, Sampling, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one declared operator from SURVEY.md §2
  * (the key names carry the §2 IDs); [[oracleSql]] holds the equivalent
  * DuckDB SQL over the same parquet tables. Column names AND types are
  * aligned on both sides because the driver sorts columns by name and
  * hash-compares values. Money aggregates run through DECIMAL(18,2) on
  * both sides so sums are exact and order-independent (double sums would
  * vary with partitioning at scale), then surface as DOUBLE.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> CoreOps.q1PricingSummary _,
    "f2_filter_project"  -> CoreOps.f2FilterProject _,
    "f3_prefix_filter"   -> CoreOps.f3PrefixFilter _,
    "j1_agg_join"        -> CoreOps.j1AggJoin _,
    "j2_semi_join"       -> CoreOps.j2SemiJoin _,
    "j2_anti_join"       -> CoreOps.j2AntiJoin _,
    "j5_outer_join"      -> CoreOps.j5OuterJoin _,
    "b1_bucketed_join"   -> CoreOps.b1BucketedJoin _,
    "skew_salted_join"   -> Skew.skewDemo _,
    "sql_scalar_subquery" -> CoreOps.sqlScalarSubquery _,
    "j3_fact_dim_join"   -> CoreOps.j3FactDimJoin _,
    "j4_topk_rejoin"     -> CoreOps.j4TopkRejoin _,
    "q3_multi_join"      -> CoreOps.q3ShippingPriority _,
    "p1_partition_pruning" -> CoreOps.p1PartitionPruning _,
    "q5_star_join"       -> CoreOps.q5StarJoin _,
    "a5_global_agg"      -> CoreOps.a5GlobalAgg _,
    "a6_composite_agg"   -> CoreOps.a6CompositeAgg _,
    "a7_pivot"           -> CoreOps.a7Pivot _,
    "a8_count_distinct"  -> CoreOps.a8CountDistinct _,
    "a9_rollup"          -> CoreOps.a9Rollup _,
    "a10_median"         -> CoreOps.a10Median _,
    "a12_median_scalable" -> CoreOps.a12MedianScalable _,
    "a13_cube"           -> CoreOps.a13Cube _,
    "a14_quantile_gate"  -> ((s, d) => Gates.quantileGate(s, d)),
    "mix_weighted"       -> Sampling.mixWeighted _,
    "a11_two_phase_distinct" -> CoreOps.a11TwoPhaseDistinct _,
    "x13_date_parse"     -> CoreOps.x13DateParse _,
    "x14_vector_expr"    -> CoreOps.x14VectorExpr _,
    "t1_topk"            -> CoreOps.t1TopK _,
    "t2_top1"            -> CoreOps.t2Top1 _,
    "t3_sort_asc"        -> CoreOps.t3SortAsc _,
    "t4_limit"           -> CoreOps.t4Limit _,
    "x3_month_format"    -> CoreOps.x3MonthFormat _,
    "x9_json_extract"    -> CoreOps.x9JsonExtract _,
    "x12_explode_array"  -> CoreOps.x12ExplodeArray _,
    "x_scalar_suite"     -> CoreOps.xScalarSuite _,
    "s1_csv_roundtrip"   -> CoreOps.s1CsvRoundtrip _,
    "s7_orc_roundtrip"   -> CoreOps.s7OrcRoundtrip _,
    "s20_xml_roundtrip"  -> CoreOps.s20XmlRoundtrip _,
    "eth_csv_pipeline"   -> graft.queries.EthParity.csvPipelineOverTestdata _,
    "s2_json_map_explode" -> CoreOps.s2JsonMapExplode _,
    "w1_window_rank"     -> CoreOps.w1WindowRank _,
    "w2_running_sum"     -> CoreOps.w2RunningSum _,
    // -------- training-data pipeline extensions (SURVEY §7.5) --------
    "dedup_exact"        -> Dedup.exact _,
    "dedup_jaccard"      -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh"  -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"      -> ((s, d) => Gates.simhashGate(s, d)),
    "dedup_corpus"       -> ((s, d) => Dedup.dedupCorpus(s, d)),
    "text_tokens"        -> TextOps.tokenCount _,
    "text_quality"       -> TextOps.qualityScore _,
    "text_langid"        -> TextOps.langId _,
    "text_fingerprint"   -> TextOps.fingerprint _,
    "text_term_stats"    -> ((s, d) => TextOps.termStats(s, d)),
    "text_tfidf"         -> ((s, d) => TextOps.tfidf(s, d)),
    "sample_stratified"  -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "pack_chunks"        -> ((s, d) => Sampling.packChunks(s, d)),
    "split_assign"       -> ((s, d) => Sampling.splitAssign(s, d)),
    "w_global_row_number" -> Sampling.globalRowNumber _,
    "sim_cosine_topk"    -> ((s, d) => Similarity.cosineTopK(s, d)),
    "sim_near_dup"       -> ((s, d) => Similarity.embeddingNearDupBlocked(s, d)),
    "sim_quantize_int8"  -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "sim_lsh_topk"       -> ((s, d) => Gates.lshRecallGate(s, d)),
    "sim_ivf_topk"       -> ((s, d) => Gates.ivfRecallGate(s, d)),
    "sim_ivf_indexed"    -> graft.streaming.StreamGates.simIvfIndexed _,
    "mm_decode"          -> Multimodal.decodeMeta _,
    "mm_frame_sample"    -> Multimodal.frameSample _,
    "mm_resize"          -> Multimodal.resize _,
    "ev_window"          -> EventOps.tumblingWindow _,
    "ev_session"         -> ((s, d) => EventOps.sessionize(s, d)),
    "ev_session_native"  -> ((s, d) => EventOps.sessionizeNative(s, d)),
    "asof_purchase_attribution" -> AsofJoin.purchaseAttribution _,
    "stream_batch_parity" -> graft.streaming.StreamGates.streamBatchParity _,
    "text_repetition"    -> TextOps.repetition _,
    "a15_hll_merge"      -> ((s, d) => Gates.hllMergeGate(s, d)),
    "p2_dynamic_pruning" -> CoreOps.p2DynamicPruning _,
    "profile_orders"     -> Profile.ordersProfile _,
    "table_fingerprint"  -> Profile.lineitemFingerprint _,
    "fingerprint_buckets" -> Profile.lineitemFingerprintBuckets _,
    "zorder_codes"       -> ZOrder.mortonDemo _,
    "j6_full_outer"      -> CoreOps.j6FullOuter _,
    "a16_grouping_sets"  -> CoreOps.a16GroupingSets _,
    "x15_array_hof"      -> CoreOps.x15ArrayHof _,
    "w3_sliding_sum"     -> CoreOps.w3SlidingSum _,
    "decon_ngram_overlap" -> ((s, d) => Decontam.ngramOverlap(s, d)),
    "decon_ngram_hashed" -> ((s, d) => Decontam.ngramOverlapHashed(s, d)),
    "decon_semantic"     -> ((s, d) => Decontam.semanticOverlap(s, d)),
    "upsert_latest"      -> Changelog.upsertLatest _,
    "range_join_binned"  -> RangeJoin.priceBandDemo _,
    "j12_interval_overlap" -> RangeJoin.balanceBandDemo _,
    "a17_histogram"      -> ((s, d) => CoreOps.a17Histogram(s, d)),
    "p3_bloom_join"      -> ((s, d) => Gates.bloomJoinGate(s, d)),
    "sim_semdedup"       -> ((s, d) => Gates.semDedupGate(s, d)),
    "a18_count_min"      -> ((s, d) => Gates.countMinGate(s, d)),
    "w4_ntile_lead"      -> CoreOps.w4NtileLead _,
    "text_pii_scrub"     -> TextOps.piiScrub _,
    "text_vocab_oov"     -> ((s, d) => TextOps.vocabOov(s, d)),
    "ev_funnel"          -> ((s, d) => EventOps.funnel(s, d)),
    "ev_retention"       -> EventOps.retention _,
    "sample_cap_per_source" -> ((s, d) => Sampling.capPerSource(s, d)),
    "text_inverted_index" -> ((s, d) => TextOps.invertedIndex(s, d)),
    "text_normalize"     -> TextOps.normalizeAccents _,
    "w5_range_frame"     -> CoreOps.w5RangeFrame _,
    "ev_anomaly_zscore"  -> ((s, d) => EventOps.anomalyZscore(s, d)),
    "s8_json_roundtrip"  -> CoreOps.s8JsonRoundtrip _,
    "stream_dedup_parity" -> graft.streaming.StreamGates.streamDedupParity _,
    "text_url_extract"   -> TextOps.urlExtract _,
    "text_surprisal"     -> ((s, d) => TextOps.surprisal(s, d)),
    "dedup_paragraph"    -> ((s, d) => Dedup.paragraphDedup(s, d)),
    "ev_top_paths"       -> ((s, d) => EventOps.topPaths(s, d)),
    "ev_gap_fill"        -> ((s, d) => EventOps.gapFill(s, d)),
    "corpus_diff"        -> Dedup.corpusDiff _,
    "w6_percent_rank"    -> CoreOps.w6PercentRank _,
    "a19_corr"           -> CoreOps.a19Corr _,
    "a20_mode"           -> CoreOps.a20Mode _,
    "ev_transitions"     -> EventOps.transitions _,
    "asof_next_purchase" -> ((s, d) => AsofJoin.clickNextPurchase(s, d)),
    "scd2_intervals"     -> Changelog.scd2Intervals _,
    "ev_sliding_window"  -> EventOps.slidingWindow _,
    "text_gopher_filter" -> TextOps.gopherFilter _,
    "emb_centroid"       -> Similarity.centroidPerLabel _,
    "w7_first_last"      -> CoreOps.w7FirstLast _,
    "j7_null_safe_join"  -> CoreOps.j7NullSafeJoin _,
    "a21_filtered_agg"   -> CoreOps.a21FilteredAgg _,
    "a22_percentile_cont" -> CoreOps.a22PercentileCont _,
    "merge_upsert"       -> ((s, d) => Changelog.mergeUpsert(s, d)),
    "s9_partitioned_sink" -> CoreOps.s9PartitionedSink _,
    "s10_schema_evolution" -> CoreOps.s10SchemaEvolution _,
    "stream_upsert_parity" -> graft.streaming.StreamGates.streamUpsertParity _,
    "j8_exists_correlated" -> CoreOps.j8ExistsCorrelated _,
    "a23_string_agg"     -> CoreOps.a23StringAgg _,
    "ev_window_users"    -> CoreOps.evWindowUsers _,
    "x16_regexp_suite"   -> CoreOps.x16RegexpSuite _,
    "text_chunk_overlap" -> ((s, d) => Sampling.chunkOverlap(s, d)),
    "q18_large_orders"   -> ((s, d) => CoreOps.q18LargeOrders(s, d)),
    "text_bigrams"       -> ((s, d) => TextOps.bigrams(s, d)),
    "mm_format_detect"   -> Multimodal.formatDetect _,
    "a24_stddev"         -> CoreOps.a24Stddev _,
    "x17_datetime_suite" -> CoreOps.x17DatetimeSuite _,
    "j9_set_ops"         -> CoreOps.j9SetOps _,
    "t5_limit_offset"    -> ((s, d) => CoreOps.t5LimitOffset(s, d)),
    "g1_recursive_reach" -> CoreOps.g1RecursiveReach _,
    "q13_custdist"       -> CoreOps.q13Custdist _,
    "j10_not_in"         -> CoreOps.j10NotIn _,
    "w8_forward_fill"    -> CoreOps.w8ForwardFill _,
    "q4_priority_exists" -> CoreOps.q4PriorityExists _,
    "stream_availablenow_parity" ->
      graft.streaming.StreamGates.streamAvailableNowParity _,
    "p4_nested_pruning"  -> CoreOps.p4NestedPruning _,
    "skew_aqe_join"      -> ((s, d) => Gates.aqeSkewJoinGate(s, d)),
    "q17_small_qty"      -> CoreOps.q17SmallQty _,
    "q20_potential_promo" -> CoreOps.q20PotentialPromo _,
    "q21_waiting_supp"   -> CoreOps.q21WaitingSupp _,
    "q2_min_cost_supp"   -> CoreOps.q2MinCostSupp _,
    "q10_returned_items" -> CoreOps.q10ReturnedItems _,
    "q14_promo_revenue"  -> CoreOps.q14PromoRevenue _,
    "q7_volume_shipping" -> CoreOps.q7VolumeShipping _,
    "q8_market_share"    -> CoreOps.q8MarketShare _,
    "q6_forecast_revenue" -> CoreOps.q6ForecastRevenue _,
    "q9_product_profit"  -> CoreOps.q9ProductProfit _,
    "q12_ship_priority"  -> CoreOps.q12ShipPriority _,
    "q19_discounted_revenue" -> CoreOps.q19DiscountedRevenue _,
    "q11_important_stock" -> CoreOps.q11ImportantStock _,
    "q15_top_supplier"   -> CoreOps.q15TopSupplier _,
    "q16_parts_supplier" -> CoreOps.q16PartsSupplier _,
    "q22_global_sales"   -> CoreOps.q22GlobalSales _,
    "stream_neardup_parity" ->
      graft.streaming.StreamGates.streamNearDupParity _,
    "stream_quantile_parity" ->
      graft.streaming.StreamGates.streamQuantileParity _,
    "stream_join_parity" ->
      graft.streaming.StreamGates.streamJoinParity _,
    "stream_tws_parity" ->
      graft.streaming.StreamGates.streamTwsParity _,
    "tws_batch_unified" ->
      graft.streaming.StreamGates.twsBatchUnified _,
    "stream_tws_timer_parity" ->
      graft.streaming.StreamGates.streamTwsTimerParity _,
    "stream_tws_init_parity" ->
      graft.streaming.StreamGates.streamTwsInitParity _,
    "stream_lastk_parity" ->
      graft.streaming.StreamGates.streamLastKParity _,
    "stream_tws_restart_parity" ->
      graft.streaming.StreamGates.streamTwsRestartParity _,
    "stream_static_join_parity" ->
      graft.streaming.StreamGates.streamStaticJoinParity _,
    "stream_state_reader" ->
      graft.streaming.StreamGates.streamStateReader _,
    "stream_state_changefeed" ->
      graft.streaming.StreamGates.streamStateChangefeed _,
    "stream_outer_join_parity" ->
      graft.streaming.StreamGates.streamOuterJoinParity _,
    "compact_small_files" -> Compaction.compactSmallFiles _,
    "g2_pagerank"        -> ((s, d) => EventOps.pageRank(s, d)),
    "g3_triangle_count"  -> EventOps.triangleCount _,
    "fuzzy_edit1_join"   -> FuzzyJoin.edit1Join _,
    "fuzzy_jw_topk"      -> ((s, d) => FuzzyJoin.jwTopK(s, d)),
    "mb_frequent_pairs"  -> ((s, d) => Basket.frequentPairs(s, d)),
    "a25_unpivot"        -> CoreOps.a25Unpivot _,
    "dedup_cc_clusters"  -> ((s, d) => Dedup.paraClusters(s, d)),
    "ev_ohlc"            -> EventOps.ohlc _,
    "j11_lateral_topn"   -> CoreOps.j11LateralTopn _,
    "ev_rfm_segments"    -> CoreOps.evRfmSegments _,
    "ivm_merge_daily"    -> CoreOps.ivmMergeDaily _,
    "emb_covariance"     -> Similarity.embCovariance _,
    "s11_zstd_roundtrip" -> CoreOps.s11ZstdRoundtrip _,
    "stream_session_parity" ->
      graft.streaming.StreamGates.streamSessionParity _,
    "w9_rank_suite"      -> CoreOps.w9RankSuite _,
    "x18_try_suite"      -> CoreOps.x18TrySuite _,
    "mm_ahash"           -> Multimodal.ahash _,
    "q23_yoy_growth"     -> CoreOps.q23YoyGrowth _,
    "s12_csv_dialect"    -> CoreOps.s12CsvDialect _,
    "q47_moving_avg"     -> CoreOps.q47MovingAvg _,
    "q51_cumulative_align" -> CoreOps.q51CumulativeAlign _,
    "fuzzy_cosine_join"  -> ((s, d) => FuzzyJoin.cosineJoin(s, d)),
    "fuzzy_cosine_zipf"  -> ((s, d) => FuzzyJoin.cosineZipf(s, d)),
    "fuzzy_cosine_shuffle" -> ((s, d) => FuzzyJoin.cosineZipfShuffle(s, d)),
    "q67_rollup_topk"    -> ((s, d) => CoreOps.q67RollupTopk(s, d)),
    "ev_sliding_distinct" -> ((s, d) => Gates.slidingDistinctGate(s, d)),
    "dedup_substring"    -> ((s, d) => Dedup.substringDedup(s, d)),
    "text_quality_model" -> TextOps.qualityModel _,
    "decon_bloom"        -> ((s, d) => Decontam.ngramOverlapBloom(s, d)),
    "s13_dsv2_roundtrip" -> CoreOps.s13SegRoundtrip _,
    "s14_dsv2_agg_pushdown" -> CoreOps.s14SegAggPushdown _,
    "q88_time_bands"     -> CoreOps.q88TimeBands _,
    "mix_temperature"    -> ((s, d) => Sampling.mixTemperature(s, d)),
    "ev_ewma"            -> ((s, d) => EventOps.ewma(s, d)),
    "a26_heavy_hitters"  -> ((s, d) => CoreOps.a26HeavyHitters(s, d)),
    "a27_hll_intersection" -> ((s, d) => Gates.hllIntersectionGate(s, d)),
    "sim_pq_topk"        -> ((s, d) => Pq.pqRecallGate(s, d)),
    "a28_winsorized_mean" -> CoreOps.a28WinsorizedMean _,
    "w11_gaps_islands"   -> CoreOps.w11GapsIslands _,
    "stream_dsv2_parity" -> graft.streaming.StreamGates.streamSegParity _,
    "stream_gseg_gen_parity" ->
      graft.streaming.StreamGates.streamSegGenParity _,
    "stream_gseg_sink_parity" ->
      graft.streaming.StreamGates.streamSegSinkParity _,
    "ev_ab_ttest"        -> EventOps.abTtest _,
    "sim_mips_reduction" -> ((s, d) => Gates.mipsReductionGate(s, d)),
    "q34_frequent_carts" -> ((s, d) => CoreOps.q34FrequentCarts(s, d)),
    "g4_shortest_path"   -> ((s, d) => CoreOps.g4ShortestPath(s, d)),
    "mm_wav_stats"       -> Multimodal.wavStats _,
    "asof_nearest"       -> AsofJoin.clickNearestPurchase _,
    "ev_cumulative_users" -> CoreOps.evCumulativeUsers _,
    "x19_bitwise_suite"  -> CoreOps.x19BitwiseSuite _,
    "x20_variant_suite"  -> CoreOps.x20VariantSuite _,
    "x21_collation_suite" -> CoreOps.x21CollationSuite _,
    "sql_pipe_suite"     -> CoreOps.sqlPipeSuite _,
    "sql_udf_suite"      -> CoreOps.sqlUdfSuite _,
    "sql_groupall_suite" -> CoreOps.sqlGroupAllSuite _,
    "sql_var_suite"      -> CoreOps.sqlVarSuite _,
    "s21_dsv2_delete"    -> CoreOps.s21DsvDelete _,
    "s22_dsv2_update"    -> CoreOps.s22DsvUpdate _,
    "s23_dsv2_merge"     -> CoreOps.s23DsvMerge _,
    "s24_dsv2_merge_pruned" -> CoreOps.s24DsvMergePruned _,
    "s25_dsv2_add_column" -> CoreOps.s25DsvAddColumn _,
    "s26_dsv2_merge_sync" -> CoreOps.s26DsvMergeSync _,
    "s27_dsv2_drop_column" -> CoreOps.s27DsvDropColumn _,
    "s28_dsv2_vacuum"    -> CoreOps.s28DsvVacuum _,
    "s29_dsv2_time_travel" -> CoreOps.s29DsvTimeTravel _,
    "s30_dsv2_compact"   -> CoreOps.s30DsvCompact _,
    "s31_dsv2_event_retention" -> CoreOps.s31DsvEventRetention _,
    "s32_dsv2_changefeed" -> CoreOps.s32DsvChangefeed _,
    "s33_dsv2_rename_column" -> CoreOps.s33DsvRenameColumn _,
    "s34_dsv2_ctas" -> CoreOps.s34DsvCtas _,
    "s35_dsv2_partitioned" -> CoreOps.s35DsvPartitionedTable _,
    "s37_dsv2_multi_partitioned" -> CoreOps.s37DsvMultiPartitioned _,
    "s36_dsv2_changefeed_sql" -> CoreOps.s36DsvChangefeedSql _,
    "s38_dsv2_string_prune" -> CoreOps.s38DsvStringPrune _,
    "s39_dsv2_string_partitioned" -> CoreOps.s39DsvStringPartitioned _,
    "s40_dsv2_bucketed_spj" -> CoreOps.s40DsvBucketedSpj _,
    "s41_dsv2_bloom_prune" -> CoreOps.s41DsvBloomPrune _,
    "s42_dsv2_dv_delete" -> CoreOps.s42DsvDvDelete _,
    "s43_dsv2_months_partitioned" -> CoreOps.s43DsvMonthsPartitioned _,
    "s44_dsv2_truncate_binned" -> CoreOps.s44DsvTruncateBinned _,
    "s45_dsv2_mor_update" -> CoreOps.s45DsvMorUpdate _,
    "s46_dsv2_clone" -> CoreOps.s46DsvClone _,
    "s47_dsv2_widen" -> CoreOps.s47DsvWiden _,
    "s48_dsv2_tag" -> CoreOps.s48DsvTag _,
    "s49_dsv2_zorder" -> CoreOps.s49DsvZorder _,
    "s50_dsv2_binary" -> CoreOps.s50DsvBinary _,
    "s51_dsv2_media" -> CoreOps.s51DsvMedia _,
    "s52_dsv2_embeddings" -> CoreOps.s52DsvEmbeddings _,
    "s53_dsv2_decimal38" -> CoreOps.s53DsvDecimal38 _,
    "s54_dsv2_branch_wap" -> CoreOps.s54DsvBranchWap _,
    "s55_dsv2_spec_evolution" -> CoreOps.s55DsvSpecEvolution _,
    "stream_gseg_cdf_parity" ->
      graft.streaming.StreamGates.streamSegCdfParity _,
    "stream_dv_cdf_parity" ->
      graft.streaming.StreamGates.streamDvCdfParity _,
    "stream_cdf_index_parity" ->
      graft.streaming.StreamGates.streamCdfIndexParity _,
    "dedup_containment"  -> ((s, d) => Dedup.containmentPairs(s, d)),
    "sim_pq_mips"        -> ((s, d) => Pq.pqMipsGate(s, d)),
    "s15_dynamic_overwrite" -> CoreOps.s15DynamicOverwrite _,
    "a31_weighted_median" -> CoreOps.a31WeightedMedian _,
    "ev_holt"            -> ((s, d) => EventOps.holt(s, d)),
    "text_jsd"           -> ((s, d) => TextOps.jsDivergence(s, d)),
    "ev_scan_gate"       -> EventOps.scanGate _,
    "s16_dsv2_limit_topn" -> CoreOps.s16SegLimitTopn _,
    "s17_dsv2_runtime_filter" -> CoreOps.s17SegRuntimeFilter _,
    "s18_dsv2_spj_join"  -> CoreOps.s18SegSpjJoin _,
    "s19_dsv2_agg_degrade" -> CoreOps.s19SegAggDegrade _,
  )

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val decDisc  = "(1 - CAST(l_discount AS DECIMAL(18,2)))"
  private val decTotal = "CAST(o_totalprice AS DECIMAL(18,2))"

  // --- fingerprint SQL building blocks (term-for-term Profile.scala) ---
  /** All-integer lineitem row canonicalization: money as ROUND(x*100)
    * cents, timestamp as epoch DAYS — no float/decimal/date rendering
    * on either engine. Mirrors Profile.lineitemCanonCols. */
  private val fpCanonSql =
    """concat_ws('|',
      |    coalesce(CAST(l_orderkey AS VARCHAR), ' '),
      |    coalesce(CAST(l_linenumber AS VARCHAR), ' '),
      |    coalesce(CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS VARCHAR), ' '),
      |    coalesce(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR), ' '),
      |    coalesce(CAST(datediff('day', DATE '1970-01-01',
      |                           CAST(l_shipdate AS DATE)) AS VARCHAR), ' '),
      |    coalesce(l_returnflag, ' '),
      |    coalesce(l_linestatus, ' '))""".stripMargin
  /** ascii·256^i fold of the first 8 md5 hex chars (Profile.rowSig). */
  private val fpSigFoldSql = (0 until 8).map { i =>
    s"CAST(ascii(substr(h, ${i + 1}, 1)) AS BIGINT) * ${1L << (8 * i)}"
  }.mkString("(", "\n           + ", ")")
  /** Hex-digit decode of the first 4 key-md5 chars (Profile.keyBucket). */
  private val fpBucketFoldSql = (0 until 4).map { i =>
    val d = s"ascii(substr(kh, ${i + 1}, 1))"
    s"CAST($d - 48 - CASE WHEN $d >= 97 THEN 39 ELSE 0 END AS BIGINT)" +
      s" * ${1L << (4 * (3 - i))}"
  }.mkString("(", "\n           + ", ")")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by [fuzzy_cosine_zipf] and [fuzzy_cosine_shuffle]: one
    * logical query, two physical attach branches (broadcast vs
    * doc_id sort-merge), both driver-gated against the same SQL. */
  private val zipfCosineOracle: String =
    """WITH zdoc AS (
      |  SELECT doc_id,
      |         'c0 c1 c2 g' || CAST(doc_id // 4 AS VARCHAR) || '_0'
      |         || ' g' || CAST(doc_id // 4 AS VARCHAR) || '_1'
      |         || ' g' || CAST(doc_id // 4 AS VARCHAR) || '_2'
      |         || ' g' || CAST(doc_id // 4 AS VARCHAR) || '_3'
      |         || ' g' || CAST(doc_id // 4 AS VARCHAR) || '_4'
      |         || ' g' || CAST(doc_id // 4 AS VARCHAR) || '_5'
      |         || ' u' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM zdoc),
      |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
      |       FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM zdoc),
      |w AS (SELECT tf.doc_id, tf.token, tf * ln(n_docs / df) AS w
      |      FROM tf JOIN df USING (token) CROSS JOIN n),
      |nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nm FROM w GROUP BY 1),
      |wn AS (SELECT w.doc_id, token, w / nm AS wn
      |       FROM w JOIN nrm USING (doc_id) WHERE nm > 0)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       round(SUM(a.wn * b.wn), 6) AS sim
      |FROM wn a JOIN wn b
      |  ON a.token = b.token AND a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |HAVING round(SUM(a.wn * b.wn), 6) >= 0.75""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  CAST(SUM($decPrice) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS sum_disc_price,
         |  AVG(l_quantity) AS avg_qty,
         |  CAST(SUM($decPrice) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "f2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount > 0.02
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "f3_prefix_filter" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_name LIKE 'small%' AND p_brand LIKE 'Brand#1%'""".stripMargin,
    "j1_agg_join" ->
      s"""WITH sums AS (
         |  SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |         SUM($decTotal) AS sum_price_dec
         |  FROM orders GROUP BY 1),
         |counts AS (
         |  SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |         COUNT(*) AS n_orders
         |  FROM orders GROUP BY 1)
         |SELECT sums.month, CAST(sum_price_dec AS DOUBLE) AS sum_price, n_orders,
         |       CAST(sum_price_dec AS DOUBLE) / n_orders AS avg_price
         |FROM sums JOIN counts USING (month)""".stripMargin,
    "j2_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_acctbal > 5000)""".stripMargin,
    "j2_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,
    "j3_fact_dim_join" ->
      s"""SELECT p_brand,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,
    "j4_topk_rejoin" ->
      s"""WITH top10 AS (
         |  SELECT o_custkey FROM orders GROUP BY o_custkey
         |  ORDER BY SUM($decTotal) DESC, o_custkey ASC LIMIT 10)
         |SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |       COUNT(*) AS n_orders,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_price
         |FROM orders WHERE o_custkey IN (SELECT o_custkey FROM top10)
         |GROUP BY 1""".stripMargin,
    "b1_bucketed_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus""".stripMargin,
    // the Spark side salts the hot key across 16 reducers; the oracle's
    // plain join proves salting never changes the result
    "skew_salted_join" ->
      """WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
        |                       ELSE l_orderkey END AS skew_key,
        |                  l_quantity FROM lineitem),
        |d AS (SELECT DISTINCT skew_key AS dim_key, skew_key % 7 AS grp FROM f)
        |SELECT grp, COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
        |FROM f JOIN d ON skew_key = dim_key
        |GROUP BY grp""".stripMargin,
    "j5_outer_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |       COUNT(l_orderkey) AS n_matched,
        |       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM orders LEFT OUTER JOIN
        |     (SELECT l_orderkey, l_quantity FROM lineitem) li
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above_avg,
        |       MIN(o_orderkey) AS min_key
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,
    "p1_partition_pruning" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_price
         |FROM orders WHERE year(o_orderdate) = 1995
         |GROUP BY o_orderpriority""".stripMargin,
    "q3_multi_join" ->
      s"""SELECT o_orderkey, o_orderdate,
         |  CAST(rev_dec AS DOUBLE) AS revenue FROM (
         |  SELECT o_orderkey, o_orderdate,
         |         SUM($decPrice * $decDisc) AS rev_dec
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1995-03-15'
         |    AND l_shipdate > TIMESTAMP '1995-03-15'
         |  GROUP BY o_orderkey, o_orderdate
         |  ORDER BY rev_dec DESC, o_orderkey ASC LIMIT 10)""".stripMargin,
    "q5_star_join" ->
      s"""SELECT n_name,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,
    "a5_global_agg" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price
         |FROM lineitem""".stripMargin,
    "a6_composite_agg" ->
      s"""SELECT strftime(o_orderdate, '%m-%Y') AS month, o_orderpriority,
         |       COUNT(*) AS n_orders,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_price
         |FROM orders GROUP BY 1, 2""".stripMargin,
    "a7_pivot" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a8_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a9_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY ROLLUP(o_year, o_orderpriority)""".stripMargin,
    "t1_topk" ->
      s"""SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue FROM (
         |  SELECT l_partkey, SUM($decPrice * $decDisc) AS rev
         |  FROM lineitem GROUP BY l_partkey
         |  ORDER BY rev DESC, l_partkey ASC LIMIT 10)""".stripMargin,
    "t2_top1" ->
      s"""SELECT o_custkey, CAST(spend_dec AS DOUBLE) AS spend FROM (
         |  SELECT o_custkey, SUM($decTotal) AS spend_dec
         |  FROM orders GROUP BY o_custkey
         |  ORDER BY spend_dec DESC, o_custkey ASC LIMIT 1)""".stripMargin,
    "t3_sort_asc" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_acctbal ASC, s_suppkey ASC""".stripMargin,
    "t4_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 100""".stripMargin,
    "x3_month_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%m-%Y') AS month_dash,
        |  strftime(o_orderdate, '%m/%Y') AS month_slash,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "x9_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "x12_explode_array" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings WHERE vec_id < 20""".stripMargin,
    "x_scalar_suite" ->
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 4) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  p_size * 2 + 1 AS size_calc,
        |  CAST(p_size AS VARCHAR) AS size_str,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS price_x2
        |FROM part""".stripMargin,
    "w1_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |       CAST(rn AS INTEGER) AS rn
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |        row_number() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3""".stripMargin,
    "w2_running_sum" ->
      s"""SELECT o_custkey, o_orderkey, CAST(order_seq AS INTEGER) AS order_seq,
         |       CAST(run_dec AS DOUBLE) AS run_spend
         |FROM (SELECT o_custkey, o_orderkey,
         |        row_number() OVER w AS order_seq,
         |        SUM($decTotal) OVER (PARTITION BY o_custkey
         |          ORDER BY o_orderdate, o_orderkey
         |          ROWS UNBOUNDED PRECEDING) AS run_dec
         |      FROM orders
         |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))""".stripMargin,
    "a10_median" ->
      """SELECT o_orderpriority, median(o_totalprice) AS median_price,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "a11_two_phase_distinct" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    // same oracle as a10_median — a10 proves the typed-Aggregator
    // surface, a12 the windowed formulation that survives hot groups
    "a12_median_scalable" ->
      """SELECT o_orderpriority, median(o_totalprice) AS median_price,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "a13_cube" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_year,
        |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
        |FROM orders GROUP BY CUBE(year(o_orderdate), o_orderpriority)""".stripMargin,
    "x13_date_parse" ->
      """SELECT o_orderkey,
        |  CAST(strptime(strftime(o_orderdate, '%m-%Y'), '%m-%Y') AS DATE) AS month_start,
        |  CAST(year(strptime(strftime(o_orderdate, '%m-%Y'), '%m-%Y')) AS INTEGER) AS m_year,
        |  CAST(month(strptime(strftime(o_orderdate, '%m-%Y'), '%m-%Y')) AS INTEGER) AS m_month
        |FROM orders""".stripMargin,
    "x14_vector_expr" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 50)
        |SELECT vec_id,
        |  round(list_sum(list_transform(v, x -> x*x)), 6) AS self_dot,
        |  round(sqrt(list_sum(list_transform(v, x -> x*x))), 6) AS l2_norm
        |FROM v""".stripMargin,
    "s1_csv_roundtrip" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price,
         |       MAX(l_shipdate) AS max_shipdate
         |FROM lineitem""".stripMargin,
    // oracle reads the parquet table directly — the engine's ORC
    // write+read must be value-transparent for the hashes to match
    "s7_orc_roundtrip" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price,
         |       MAX(l_shipdate) AS max_shipdate
         |FROM lineitem""".stripMargin,
    "s8_json_roundtrip" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price,
         |       MAX(l_shipdate) AS max_shipdate
         |FROM lineitem""".stripMargin,
    "s20_xml_roundtrip" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price,
         |       MAX(l_shipdate) AS max_shipdate
         |FROM lineitem WHERE l_orderkey % 10 = 0""".stripMargin,
    "eth_csv_pipeline" ->
      s"""SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |       COUNT(*) AS n_tx,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_value
         |FROM orders WHERE o_orderkey % 1000 <> 0
         |GROUP BY 1""".stripMargin,
    "s2_json_map_explode" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(event_id) AS max_event
        |FROM events GROUP BY event_type""".stripMargin,
    // -------- training-data pipeline extensions --------
    // Seed-dependent operators (SimHash pairs, LSH/IVF ANN) are gated
    // through graft.functions.Gates: the Spark side computes the exact
    // property (blocking completeness, full-probe==brute, recall floor)
    // and returns constant-true booleans a literal oracle checks.
    "dedup_simhash" ->
      "SELECT CAST(1 AS BOOLEAN) AS blocking_complete",
    "sim_lsh_topk" ->
      """SELECT CAST(1 AS BOOLEAN) AS recall_ok,
        |       CAST(1 AS BOOLEAN) AS rows_ok""".stripMargin,
    "sim_ivf_topk" ->
      """SELECT CAST(1 AS BOOLEAN) AS full_probe_exact,
        |       CAST(1 AS BOOLEAN) AS recall_ok""".stripMargin,
    // DECLARATIVE ANN INDEX LIFECYCLE: CALL create_index persists
    // centroid/assignment gseg tables; a changefeed stream maintains
    // the assignment through INSERT/UPDATE/DELETE + a checkpoint
    // restart; search runs THROUGH the stored assignments. The final
    // live count is relational (held-out slice re-inserted, %7=3
    // deleted); the parity/recall booleans are in-engine claims.
    "sim_ivf_indexed" ->
      """SELECT (SELECT COUNT(*) FROM embeddings
        |        WHERE NOT (vec_id % 7 = 3)) AS n_vectors,
        |       16 AS n_cells,
        |       CAST(1 AS BOOLEAN) AS index_matches_rebuild,
        |       CAST(1 AS BOOLEAN) AS incremental_applied,
        |       CAST(1 AS BOOLEAN) AS full_probe_exact,
        |       CAST(1 AS BOOLEAN) AS recall_ok""".stripMargin,
    // PQ gate: ADC identity + re-ranked recall are in-engine booleans
    // (no SQL engine re-derives k-means cells); the corpus count is
    // the oracle-pinned value column
    "sim_pq_topk" ->
      """SELECT CAST(1 AS BOOLEAN) AS adc_consistent,
        |       CAST(1 AS BOOLEAN) AS recall_ok,
        |       (SELECT COUNT(*) FROM embeddings) AS n_vectors""".stripMargin,
    // weighted median: integer cumulative-weight crossing (2*cum >= tot)
    // so no half-total float is ever compared
    "a31_weighted_median" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         SUM(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |           ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS tot
        |  FROM lineitem)
        |SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median,
        |       CAST(MAX(tot) AS BIGINT) AS total_weight
        |FROM w WHERE cum * 2 >= tot GROUP BY 1""".stripMargin,
    // dynamic partition overwrite: en carries generation 2 (doubled
    // n_chars), every other partition keeps generation 1
    "s15_dynamic_overwrite" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN lang = 'en' THEN 2 * n_chars
        |                     ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // PQ over the MIPS augmentation: recall boolean in-engine, the
    // expected referee row count anchored relationally
    "sim_pq_mips" ->
      """SELECT CAST(1 AS BOOLEAN) AS mips_recall_ok,
        |       (SELECT 5 * COUNT(*) FROM embeddings WHERE vec_id < 20)
        |         AS n_expected""".stripMargin,
    // §2.7 streaming gate: real file-stream pipelines (append mode,
    // watermark, EventTimeTimeout session flush) checked stream==batch
    // inside Spark; DuckDB verifies the booleans (StreamGates).
    "stream_batch_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS tumbling_parity,
        |       CAST(1 AS BOOLEAN) AS sessions_flushed_parity""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "dedup_jaccard" -> jaccardOracle,
    // containment normalizes by the smaller shingle set (the
    // quote/excerpt detector); same shingle CTE as the jaccard family
    "dedup_containment" ->
      s"""WITH
         |$shingleJaccardCte
         |cp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         COUNT(*) / LEAST(ANY_VALUE(a.n), ANY_VALUE(b.n))
         |           AS containment
         |  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, containment
         |FROM cp WHERE containment >= 0.8""".stripMargin,
    // minhashLsh verifies every LSH candidate with the exact shingle
    // Jaccard, and P(candidate miss at j>=0.6) = (1-0.6^2)^32 ~= 6e-7,
    // so its output equals the exact-Jaccard oracle.
    "dedup_minhash_lsh" -> jaccardOracle,
    // LSH == exact-Jaccard pairs (verified candidates), so components
    // over (jaccard ∪ exact-dup) edges are SQL-expressible recursively.
    "dedup_corpus" ->
      s"""WITH RECURSIVE
         |$shingleJaccardCte
        |exdup AS (
        |  SELECT mn AS doc_a, b AS doc_b FROM (
        |    SELECT MIN(doc_id) AS mn, unnest(list(doc_id)) AS b
        |    FROM documents GROUP BY text) WHERE b > mn),
        |p AS (SELECT * FROM jac UNION SELECT * FROM exdup),
        |ed AS (SELECT doc_a AS s, doc_b AS t FROM p UNION SELECT doc_b, doc_a FROM p),
        |r(n, m) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM ed)
        |  UNION
        |  SELECT r.n, ed.t FROM r JOIN ed ON ed.s = r.m),
        |comp AS (SELECT n AS doc_id, MIN(m) AS component FROM r GROUP BY n)
        |SELECT d.doc_id,
        |       (c.component IS NULL OR c.component = d.doc_id) AS keep
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  n_chars
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  CAST(len(tk) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(tk)) AS INTEGER) AS n_distinct,
        |  len(list_distinct(tk)) / len(tk) AS distinct_ratio,
        |  len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) / len(tk) AS stop_ratio,
        |  n_chars / len(tk) AS chars_per_token
        |FROM t""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, lang,
        |        len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) / len(tk) AS en_score
        |      FROM t)
        |SELECT doc_id, lang, en_score,
        |       CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'und' END AS predicted_lang
        |FROM s""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "text_term_stats" ->
      """SELECT token, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token ASC LIMIT 100""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |x AS (SELECT tf.doc_id, tf.token,
        |        round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |      FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tfidf, CAST(rn AS INTEGER) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token ASC) AS rn FROM x)
        |WHERE rn <= 3""".stripMargin,
    // the engine's two-phase bucket-offset ids must telescope to the
    // plain (single-task) global window the oracle runs
    "w_global_row_number" ->
      """SELECT doc_id,
        |       row_number() OVER (ORDER BY doc_id) - 1 AS rid
        |FROM documents""".stripMargin,
    "sample_stratified" ->
      """WITH t AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        |FROM documents)
        |SELECT lang, doc_id FROM t WHERE rn <= ceil(n / 10.0)""".stripMargin,
    // the engine computes start_tok as a distributed two-phase prefix
    // sum; the oracle's plain running-sum window proves it telescopes
    // to the exact global cumsum
    "pack_chunks" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
        |      FROM t)
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, start_tok,
        |       start_tok // 2048 AS chunk_id,
        |       start_tok % 2048 AS chunk_off
        |FROM c""".stripMargin,
    // GK-sketch quantiles have no SQL-reproducible value (merge order
    // varies with partitioning); the error bound vs the exact
    // percentile IS the contract, checked in-engine (Gates).
    "a14_quantile_gate" ->
      "SELECT CAST(1 AS BOOLEAN) AS quantiles_ok",
    "mix_weighted" ->
      """WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
        |  FROM documents),
        |w AS (SELECT *, 1 + COALESCE(TRY_CAST(substring(source, 4) AS INTEGER), 0) % 3 AS w FROM r)
        |SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
        |       src_rank / w AS mix_key
        |FROM w""".stripMargin,
    "split_assign" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(('0x' || substring(md5(text), 1, 4)) AS INTEGER) % 100 AS bucket
        |FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b""".stripMargin,
    "sim_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, vec_id, $cosSql AS cos
         |  FROM v CROSS JOIN q WHERE vec_id <> query_id)
         |SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rn AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, vec_id) AS rn FROM scored)
         |WHERE rn <= 5""".stripMargin,
    "sim_near_dup" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |             a.v AS qv, b.v AS v
         |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(cos, 6) AS cos
         |FROM (SELECT vec_a, vec_b, $cosSql AS cos FROM p)
         |WHERE cos >= 0.45""".stripMargin,
    "sim_quantize_int8" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 20),
        |m AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS amax
        |      FROM v)
        |SELECT vec_id,
        |  CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS pos,
        |  CAST(round(unnest(v) * 127.0 / amax) AS INTEGER) AS q
        |FROM m""".stripMargin,
    // mm_decode/mm_resize: the engine renders, PNG/JPEG-encodes, then
    // REALLY decodes each payload (javax.imageio); the oracle predicts
    // the decoded values arithmetically because the planted raster is
    // linear-mod-256 in (doc_id, x, y) and PNG is lossless. JPEG rows
    // (doc_id % 3 = 0) check format + geometry; content probes are NULL
    // on both sides (lossy pixel values aren't portably predictable).
    "mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'jpeg' ELSE 'png' END AS fmt,
        |         16 + doc_id % 48 AS w,
        |         16 + (doc_id * 7) % 32 AS h
        |  FROM documents),
        |r0 AS (
        |  SELECT doc_id, CAST(SUM((doc_id * 31 + x * 7) % 256) AS BIGINT) AS s0
        |  FROM (SELECT doc_id, unnest(generate_series(0, w - 1)) AS x
        |        FROM d WHERE fmt = 'png')
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.fmt,
        |  CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 31) % 256 END AS INTEGER) AS c00_r,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 17) % 256 END AS INTEGER) AS c00_g,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 11) % 256 END AS INTEGER) AS c00_b,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 31 + (d.w-1)*7 + (d.h-1)*13) % 256
        |    END AS INTEGER) AS c11_r,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 17 + (d.w-1)*3 + (d.h-1)*29) % 256
        |    END AS INTEGER) AS c11_g,
        |  CAST(CASE WHEN d.fmt = 'png'
        |    THEN (d.doc_id * 11 + (d.w-1)*23 + (d.h-1)*5) % 256
        |    END AS INTEGER) AS c11_b,
        |  r0.s0 AS row0_red_sum
        |FROM d LEFT JOIN r0 ON d.doc_id = r0.doc_id""".stripMargin,
    // mid_r mirrors the engine's align-corners bilinear at output
    // (12, 0): row 0 has no y-interpolation, so the probe is the exact
    // double expression (1-fx)*p(x0) + fx*p(x1) rounded half-up — both
    // engines run the identical IEEE-double op sequence.
    "mm_resize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'jpeg' ELSE 'png' END AS fmt,
        |         16 + doc_id % 48 AS w,
        |         16 + (doc_id * 7) % 32 AS h
        |  FROM documents),
        |m AS (
        |  SELECT *, 12.0 * (w - 1) / 23 AS sx,
        |         CAST(floor(12.0 * (w - 1) / 23) AS INTEGER) AS x0
        |  FROM d),
        |m2 AS (SELECT *, sx - x0 AS fx, LEAST(x0 + 1, w - 1) AS x1 FROM m)
        |SELECT doc_id, fmt,
        |  CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
        |  CAST(24 AS INTEGER) AS out_w, CAST(16 AS INTEGER) AS out_h,
        |  CAST(CASE WHEN fmt = 'png'
        |    THEN (doc_id*31) % 256 END AS INTEGER) AS c00_r,
        |  CAST(CASE WHEN fmt = 'png'
        |    THEN (doc_id*31 + (w-1)*7) % 256 END AS INTEGER) AS c10_r,
        |  CAST(CASE WHEN fmt = 'png'
        |    THEN (doc_id*31 + (h-1)*13) % 256 END AS INTEGER) AS c01_r,
        |  CAST(CASE WHEN fmt = 'png'
        |    THEN (doc_id*31 + (w-1)*7 + (h-1)*13) % 256
        |    END AS INTEGER) AS c11_r,
        |  CAST(CASE WHEN fmt = 'png'
        |    THEN floor((1.0 - fx) * ((doc_id*31 + x0*7) % 256)
        |               + fx * ((doc_id*31 + x1*7) % 256) + 0.5)
        |    END AS INTEGER) AS mid_r
        |FROM m2""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * 64 AS INTEGER) AS frame_off,
        |  CAST(LEAST(64, n - f * 64) AS INTEGER) AS frame_len
        |FROM (SELECT doc_id, n,
        |        unnest(generate_series(0, CAST(ceil(n / 64.0) AS BIGINT) - 1)) AS f
        |      FROM m)""".stripMargin,
    "ev_window" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN takes the latest right row with
    // ts <= left ts; the engine resolves (user, ts) click ties to the
    // max event_id, so the oracle dedupes clicks the same way first.
    // Micros BIGINTs on both sides sidestep timestamp-precision hashing.
    "asof_purchase_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.purchase_us, c.click_id, c.click_us,
        |       p.purchase_us - c.click_us AS gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    // the NATIVE session_window engine path. Boundary semantics
    // verified empirically: an exactly-gap-spaced pair MERGES (Spark
    // splits only on silence strictly > gap) — the same comparator as
    // the lag mirror, so both oracles use >
    "ev_session_native" ->
      """WITH x AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM x),
        |z AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |      FROM y)
        |SELECT user_id, COUNT(*) AS n_events,
        |       MIN(us) AS start_us, MAX(us) AS end_us,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    "ev_session" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM x),
        |z AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |      FROM y)
        |SELECT user_id, CAST(session_seq AS INTEGER) AS session_seq,
        |       COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    // n-gram construction parity: DuckDB 1-based list indexing over
    // generate_series == Spark array_join(slice(...)); empty when the
    // doc has fewer than n tokens (generate_series(1, k<1) is empty)
    "text_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c
        |       FROM (SELECT doc_id, unnest(l) AS t FROM tk) GROUP BY 1, 2),
        |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |              MAX(c) AS top_tok FROM tc GROUP BY 1),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c
        |       FROM (SELECT doc_id, l[i] || ' ' || l[i+1] AS b
        |             FROM (SELECT doc_id, l,
        |                     unnest(generate_series(1, len(l) - 1)) AS i
        |                   FROM tk)) GROUP BY 1, 2),
        |ba AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigram,
        |              MAX(c) AS top_bigram FROM bc GROUP BY 1)
        |SELECT ta.doc_id, n_tok, top_tok,
        |       CAST(top_tok AS DOUBLE) / n_tok AS top_tok_frac,
        |       COALESCE(n_bigram, 0) AS n_bigram,
        |       COALESCE(top_bigram, 0) AS top_bigram,
        |       COALESCE(CAST(top_bigram AS DOUBLE) / n_bigram, 0.0)
        |         AS top_bigram_frac
        |FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id""".stripMargin,
    // same md5-bucket split rule as split_assign; trigram overlap
    // between the train and test splits
    "decon_ngram_overlap" -> deconNgramSql,
    // the hashed (xxhash64-keyed) scale path produces the IDENTICAL
    // report — 64-bit collisions are a birthday-bound non-event at any
    // realistic gram vocabulary — so the same string-gram oracle gates
    // the pipeline a 100 TB run would actually execute
    "decon_ngram_hashed" -> deconNgramSql,
    // Bloom prefilter + exact verify join: no false negatives, FPs die
    // in the verify, so the report is IDENTICAL to the exact overlap —
    // the same oracle certifies the sketch-prefiltered scale path
    "decon_bloom"        -> deconNgramSql,
    // the DSv2 connector roundtrip must reproduce the direct-parquet
    // aggregate exactly: segments are lossless and the pushed filter
    // matches relational semantics
    "s13_dsv2_roundtrip" ->
      s"""SELECT l_returnflag,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_price
         |FROM lineitem
         |WHERE l_quantity > 25
         |GROUP BY 1""".stripMargin,
    // header-answered aggregates must equal the relational recompute
    "s14_dsv2_agg_pushdown" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  COUNT(l_partkey) AS n_partkey,
         |  MIN(l_orderkey) AS min_okey,
         |  MAX(l_orderkey) AS max_okey,
         |  MIN(l_quantity) AS min_qty,
         |  MAX(l_quantity) AS max_qty
         |FROM lineitem""".stripMargin,
    // TPC-DS Q88 shape: the textbook 8-scalar-subquery formulation
    // reads the fact table 8 times; the engine folds all bands into
    // ONE conditional aggregate over ONE scan
    "q88_time_bands" ->
      """SELECT
        |  COUNT(CASE WHEN l_quantity >= 1 AND l_quantity < 7 THEN 1 END) AS b1,
        |  COUNT(CASE WHEN l_quantity >= 7 AND l_quantity < 13 THEN 1 END) AS b2,
        |  COUNT(CASE WHEN l_quantity >= 13 AND l_quantity < 19 THEN 1 END) AS b3,
        |  COUNT(CASE WHEN l_quantity >= 19 AND l_quantity < 25 THEN 1 END) AS b4,
        |  COUNT(CASE WHEN l_quantity >= 25 AND l_quantity < 31 THEN 1 END) AS b5,
        |  COUNT(CASE WHEN l_quantity >= 31 AND l_quantity < 37 THEN 1 END) AS b6,
        |  COUNT(CASE WHEN l_quantity >= 37 AND l_quantity < 43 THEN 1 END) AS b7,
        |  COUNT(CASE WHEN l_quantity >= 43 AND l_quantity < 51 THEN 1 END) AS b8
        |FROM lineitem
        |WHERE l_discount <= 0.08 OR l_tax >= 0.04""".stripMargin,
    // temperature mixing: quota arithmetic is all-integer (isqrt
    // weights, div/mod largest remainder) so no float share ever
    // feeds a floor — engines cannot disagree at a quota boundary
    "mix_temperature" ->
      """WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang,
        |        CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM n),
        |t AS (SELECT SUM(w) AS tw FROM w),
        |q0 AS (SELECT lang, w, 300 * w // tw AS q, (300 * w) % tw AS rem
        |       FROM w, t),
        |lo AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rrank,
        |         (SELECT 300 - SUM(q) FROM q0) AS leftover FROM q0),
        |quota AS (SELECT lang,
        |            CAST(q + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END
        |                 AS BIGINT) AS quota
        |          FROM lo),
        |r AS (SELECT doc_id, lang, row_number() OVER
        |        (PARTITION BY lang ORDER BY doc_id) AS src_rank
        |      FROM documents)
        |SELECT r.doc_id, r.lang, quota.quota AS quota,
        |       CAST(src_rank AS BIGINT) AS src_rank
        |FROM r JOIN quota USING (lang) WHERE src_rank <= quota.quota""".stripMargin,
    // Welch A/B readout: DECIMAL moments (the a24 widening), then one
    // fixed double formula over identical inputs on both engines
    "ev_ab_ttest" ->
      """WITH m AS (
        |  SELECT event_type,
        |    COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0
        |             THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sx_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0
        |             THEN CAST(value AS DECIMAL(28,6))
        |                * CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx_a,
        |    COUNT(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS n_b,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0
        |             THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sx_b,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0
        |             THEN CAST(value AS DECIMAL(28,6))
        |                * CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx_b
        |  FROM events GROUP BY 1),
        |v AS (
        |  SELECT *,
        |    greatest(0, (sxx_a - sx_a*sx_a/n_a)/(n_a-1)) / n_a AS va,
        |    greatest(0, (sxx_b - sx_b*sx_b/n_b)/(n_b-1)) / n_b AS vb
        |  FROM m)
        |SELECT event_type, n_a, n_b,
        |  round(sx_a/n_a, 6) AS mean_a, round(sx_b/n_b, 6) AS mean_b,
        |  round((sx_a/n_a - sx_b/n_b) / sqrt(va + vb), 6) AS t_welch,
        |  round((va+vb)*(va+vb) /
        |        (va*va/(n_a-1) + vb*vb/(n_b-1)), 4) AS df_welch
        |FROM v""".stripMargin,
    // MIPS reduction: set equality checked in-engine; query count
    // anchored relationally
    "sim_mips_reduction" ->
      """SELECT CAST(1 AS BOOLEAN) AS reduction_exact,
        |       (SELECT COUNT(*) FROM embeddings WHERE vec_id < 20)
        |         AS n_queries""".stripMargin,
    // nearest-either-direction as-of: purchases unique per (user, ts)
    // so argmin by (|gap|, backward-on-tie) pins a unique match
    "asof_nearest" ->
      """WITH purchases AS (
        |  SELECT user_id, ts AS purchase_ts, MIN(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |clicks AS (
        |  SELECT event_id AS click_id, user_id, ts
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT c.click_id, p.purchase_id,
        |         epoch_us(p.purchase_ts) AS purchase_us,
        |         epoch_us(p.purchase_ts) - epoch_us(c.ts) AS g,
        |         row_number() OVER (PARTITION BY c.click_id
        |           ORDER BY abs(epoch_us(p.purchase_ts) - epoch_us(c.ts)),
        |                    (epoch_us(p.purchase_ts) - epoch_us(c.ts)) > 0)
        |           AS rn
        |  FROM clicks c JOIN purchases p ON c.user_id = p.user_id)
        |SELECT c.click_id, c.user_id, epoch_us(c.ts) AS click_us,
        |       k.purchase_id, k.purchase_us, k.g AS gap_us
        |FROM clicks c
        |LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k USING (click_id)""".stripMargin,
    // cumulative distinct = running sum of first-seen counts
    "ev_cumulative_users" ->
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        |           FROM events GROUP BY 1),
        |n AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
        |SELECT day, new_users,
        |       CAST(SUM(new_users) OVER (ORDER BY day
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM n""".stripMargin,
    // bitwise aggregate + scalar surface; all-integer
    "x19_bitwise_suite" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  bit_and(o_custkey) AS band, bit_or(o_custkey) AS bor,
        |  bit_xor(o_custkey) AS bxor,
        |  CAST(SUM(xor(o_custkey, o_custkey >> 3)) AS BIGINT) AS sum_mix,
        |  CAST(SUM(o_custkey & 255) AS BIGINT) AS sum_low,
        |  CAST(SUM((o_custkey & 15) << 2) AS BIGINT) AS sum_shift
        |FROM orders GROUP BY 1""".stripMargin,
    // VARIANT access matrix: the oracle recomputes every leg
    // relationally from the base columns — poison rows (key ≡ 0 mod 7)
    // fail try_parse_json, `cust` exists only on even keys, the JSON
    // null rides keys ≡ 0 mod 3, money through DECIMAL on both sides
    "x20_variant_suite" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_parsed,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS sum_price,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 2 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cust,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 3 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_json_null,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0
        |    THEN CAST(substr(o_orderpriority, 1, 1) AS INTEGER) END)
        |    AS BIGINT) AS sum_pd,
        |  CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_prio_ok
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // Pipe-syntax chain: the oracle is the identical relational
    // program in nested SQL — EliminatePipeOperators guarantees the
    // engine plans the pipe form to the same logical plan
    "sql_pipe_suite" ->
      """SELECT o.o_orderpriority AS prio,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue,
        |       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        |FROM lineitem JOIN orders o ON l_orderkey = o.o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY 1""".stripMargin,
    // SQL-language UDFs inline at analysis time, so the oracle states
    // the same arithmetic with the function bodies substituted; the
    // DECIMAL(38,4) return type is exact-widening (no rounding at the
    // function boundary to disagree about)
    "sql_udf_suite" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid'
        |            ELSE 'high' END AS band,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |         AS DECIMAL(38,4))) AS DOUBLE) AS sum_net,
        |       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // GROUP BY ALL / ORDER BY ALL expand at analysis time; the oracle
    // states the expanded ordinal form (year() is BIGINT in DuckDB —
    // cast to the INT Spark's year() returns; avg_rev divides the
    // already-double sum so no decimal-division scale is in play)
    "sql_groupall_suite" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS rev,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) AS avg_rev
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,
    // session variables fold to literals before optimization; the
    // oracle inlines the data-derived cutoff as a scalar subquery
    // (MAX/2 is exact — no float tie) and the lateral-alias
    // arithmetic verbatim
    "sql_var_suite" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST((SELECT MAX(l_quantity) / 2 FROM lineitem) AS DOUBLE)
        |         AS cut,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS gross,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) AS per_item
        |FROM lineitem
        |WHERE l_quantity > (SELECT MAX(l_quantity) / 2 FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // group-based DELETE: the oracle is the table with the deleted
    // predicate negated (copy-on-write leaves exactly the keepers)
    "s21_dsv2_delete" ->
      """SELECT l_returnflag,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM lineitem
        |WHERE NOT (l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // group-based UPDATE: the oracle applies the same SET expressions
    // as CASE WHEN over the base table
    "s22_dsv2_update" ->
      """SELECT rf AS l_returnflag,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(disc AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_disc,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM (SELECT CASE WHEN l_quantity < 3
        |               THEN 'U' || l_returnflag ELSE l_returnflag END AS rf,
        |             CASE WHEN l_quantity < 3
        |               THEN 0.0 ELSE l_discount END AS disc,
        |             l_extendedprice
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // MERGE upsert: the oracle reconstructs the post-merge table with
    // a FULL OUTER JOIN of the target seed (even keys) and the source
    // feed (every third key) — matched rows doubled and stamped 2,
    // source-only rows inserted as 1, target-only rows untouched as 0
    "s23_dsv2_merge" ->
      """WITH t0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders WHERE o_orderkey % 2 = 0),
        |     s0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders WHERE o_orderkey % 3 = 0),
        |     merged AS (
        |       SELECT COALESCE(t0.k, s0.k) AS k,
        |              CASE WHEN t0.k IS NOT NULL AND s0.k IS NOT NULL
        |                     THEN t0.qty + s0.qty
        |                   WHEN t0.k IS NOT NULL THEN t0.qty
        |                   ELSE s0.qty END AS qty,
        |              CAST(CASE WHEN t0.k IS NOT NULL AND s0.k IS NOT NULL
        |                     THEN 2
        |                   WHEN t0.k IS NOT NULL THEN 0
        |                   ELSE 1 END AS BIGINT) AS src
        |       FROM t0 FULL OUTER JOIN s0 ON t0.k = s0.k)
        |SELECT src, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    // MERGE under runtime group filtering: same reconstruction as
    // s23, with the corrections feed confined to keys above
    // floor(max*3/4) — the pruning is an execution property (counter-
    // recorded, spec-pinned), so the oracle only restates semantics
    "s24_dsv2_merge_pruned" ->
      """WITH mx AS (SELECT MAX(o_orderkey) * 3 // 4 AS cut FROM orders),
        |     t0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders WHERE o_orderkey % 2 = 0),
        |     s0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders, mx
        |            WHERE o_orderkey % 3 = 0 AND o_orderkey > cut),
        |     merged AS (
        |       SELECT COALESCE(t0.k, s0.k) AS k,
        |              CASE WHEN t0.k IS NOT NULL AND s0.k IS NOT NULL
        |                     THEN t0.qty + s0.qty
        |                   WHEN t0.k IS NOT NULL THEN t0.qty
        |                   ELSE s0.qty END AS qty,
        |              CAST(CASE WHEN t0.k IS NOT NULL AND s0.k IS NOT NULL
        |                     THEN 2
        |                   WHEN t0.k IS NOT NULL THEN 0
        |                   ELSE 1 END AS BIGINT) AS src
        |       FROM t0 FULL OUTER JOIN s0 ON t0.k = s0.k)
        |SELECT src, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    // ALTER TABLE ADD COLUMN: generation 1 (even keys) predates the
    // column and null-fills; generation 2 (odd keys) carries values —
    // the oracle reconstructs both generations with UNION ALL
    "s25_dsv2_add_column" ->
      """WITH t AS (
        |  SELECT o_orderkey AS k, o_totalprice AS qty,
        |         CAST(NULL AS BIGINT) AS seg
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderkey % 4
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT COALESCE(seg, -1) AS seg_id, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    // MERGE snapshot-sync (full action matrix): target-only keys are
    // DELETED by the not-matched-by-source leg, so the reconstruction
    // keeps source-present keys only — matched rows summed and
    // stamped 2, source-only rows inserted as 1
    "s26_dsv2_merge_sync" ->
      """WITH t0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders WHERE o_orderkey % 2 = 0),
        |     s0 AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |            FROM orders WHERE o_orderkey % 3 = 0),
        |     merged AS (
        |       SELECT s0.k AS k,
        |              CASE WHEN t0.k IS NOT NULL
        |                     THEN t0.qty + s0.qty
        |                   ELSE s0.qty END AS qty,
        |              CAST(CASE WHEN t0.k IS NOT NULL THEN 2
        |                   ELSE 1 END AS BIGINT) AS src
        |       FROM s0 LEFT JOIN t0 ON t0.k = s0.k)
        |SELECT src, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    // VACUUM procedure: the killed UPDATE never committed (atomicity),
    // so the readback is the original even-key table; reclaimed_some
    // is pinned TRUE — the crash must actually strand orphans
    "s28_dsv2_vacuum" ->
      """SELECT o_orderkey % 3 AS bucket, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       MAX(o_orderkey) AS max_k,
        |       TRUE AS reclaimed_some
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // event-time retention DELETE: survivors = events at or above the
    // integer-midpoint micros horizon, identical arithmetic both sides
    "s31_dsv2_event_retention" ->
      """WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
        |             AS cut
        |           FROM events WHERE user_id < 200),
        |     kept AS (SELECT event_type, value, epoch_us(ts) AS us
        |              FROM events, b
        |              WHERE user_id < 200 AND epoch_us(ts) >= cut)
        |SELECT event_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value,
        |       MIN(us) AS min_us, MAX(us) AS max_us
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,
    // GENERATION-DIFF CHANGEFEED: endpoint diff of gen 0 vs gen 3
    // (UPDATE top half, DELETE top quarter, INSERT odd keys) — the
    // oracle reconstructs the four change classes relationally with
    // the same integer-division cuts; files_bounded is pinned TRUE
    // (the untouched lower-half files never entered the diff)
    "s32_dsv2_changefeed" ->
      """WITH e AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |           FROM orders WHERE o_orderkey % 2 = 0),
        |     b AS (SELECT MAX(k) // 2 AS cut, (3 * MAX(k)) // 4 AS cut2
        |           FROM e),
        |     chg AS (
        |       SELECT 'insert' AS _change_type, o_orderkey AS k,
        |              o_totalprice AS qty
        |       FROM orders WHERE o_orderkey % 2 = 1
        |       UNION ALL
        |       SELECT 'delete', k, qty FROM e, b WHERE k >= cut2
        |       UNION ALL
        |       SELECT 'update_preimage', k, qty FROM e, b
        |       WHERE k >= cut AND k < cut2
        |       UNION ALL
        |       SELECT 'update_postimage', k, qty + 1.0 FROM e, b
        |       WHERE k >= cut AND k < cut2)
        |SELECT _change_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(k) AS min_k, MAX(k) AS max_k,
        |       TRUE AS files_bounded
        |FROM chg GROUP BY 1 ORDER BY 1""".stripMargin,
    // PARTITIONED BY catalog tables: the relational half is the
    // orders x lineitem join excluding the DELETEd key class (k
    // equality is implied by orderkey equality); the spj booleans
    // (zero-exchange before AND after the DML) are in-engine evidence
    // pinned TRUE
    "s35_dsv2_partitioned" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_shuffle_free, TRUE AS spj_after_dml
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey % 32 <> 7""".stripMargin,
    // changefeed SQL surface: PER-COMMIT semantics (unlike s32's
    // endpoint collapse) — the UPDATE's pre/post pairs at gen 1, the
    // DELETE's rows (carrying post-update values) at gen 2, the
    // INSERT's rows at gen 3; _commit_generation pins each class
    "s36_dsv2_changefeed_sql" ->
      """WITH e AS (SELECT o_orderkey AS k, o_totalprice AS qty
        |           FROM orders WHERE o_orderkey % 2 = 0),
        |     b AS (SELECT MAX(k) // 2 AS cut, (3 * MAX(k)) // 4 AS cut2
        |           FROM e),
        |     chg AS (
        |       SELECT 'insert' AS _change_type, qty, 3 AS g
        |       FROM (SELECT o_totalprice AS qty FROM orders
        |             WHERE o_orderkey % 2 = 1)
        |       UNION ALL
        |       SELECT 'delete', qty + 1.0, 2 FROM e, b WHERE k >= cut2
        |       UNION ALL
        |       SELECT 'update_preimage', qty, 1 FROM e, b WHERE k >= cut
        |       UNION ALL
        |       SELECT 'update_postimage', qty + 1.0, 1 FROM e, b
        |       WHERE k >= cut)
        |SELECT _change_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(MIN(g) AS BIGINT) AS min_gen,
        |       CAST(MAX(g) AS BIGINT) AS max_gen
        |FROM chg GROUP BY 1 ORDER BY 1""".stripMargin,
    // STRING ZONE MAPS: the prefix aggregate over the name-range-laid
    // table — the oracle is the plain LIKE aggregate; the
    // file-pruning boolean is counter evidence pinned TRUE
    "s38_dsv2_string_prune" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_bal,
        |       MIN(c_name) AS min_name, MAX(c_name) AS max_name,
        |       TRUE AS string_zone_pruned
        |FROM customer WHERE c_name LIKE 'Customer#0000001%'""".stripMargin,
    // STRING-KEYED PARTITIONED BY: identity clustering on a STRING
    // key (g = 'g' || 3-digit orderkey mod 24) — the DELETEd class is
    // g007 = key ≡ 7 (mod 24); the spj booleans (zero-exchange before
    // AND after DML) pinned TRUE
    "s39_dsv2_string_partitioned" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_shuffle_free, TRUE AS spj_after_dml
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE NOT (o_orderkey % 24 = 7)""".stripMargin,
    // BUCKET CLUSTERING: bucket(16, key) fact⋈fact SPJ on the raw
    // high-cardinality key; the DELETEd class is key ≡ 7 (mod 50);
    // spj booleans pinned TRUE
    "s40_dsv2_bucketed_spj" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_shuffle_free, TRUE AS spj_after_dml
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE NOT (o_orderkey % 50 = 7)""".stripMargin,
    // BLOOM FILE SKIPPING: point lookup on a hash-shuffled (unsorted)
    // key — the probe key is the smallest orderkey at-or-above half
    // the max (deterministic, relationally recomputable); the
    // file-pruning boolean is counter evidence pinned TRUE
    "s41_dsv2_bloom_prune" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS bloom_pruned
        |FROM orders
        |WHERE o_orderkey =
        |  (SELECT MIN(o_orderkey) FROM orders
        |   WHERE o_orderkey >= (SELECT MAX(o_orderkey) // 2 FROM orders))
        |""".stripMargin,
    // MERGE-ON-READ DELETE: deletion vectors — the post-DELETE
    // aggregate plus the changefeed's deleted-row count, both
    // relationally recomputable; the segment-name-set identity
    // across the DELETE is counter evidence pinned TRUE
    "s42_dsv2_dv_delete" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 3)
        |         AS deleted_rows,
        |       TRUE AS segments_preserved
        |FROM orders WHERE NOT (o_orderkey % 10 = 3)""".stripMargin,
    // TEMPORAL PARTITIONING: months(d) layout — month-grain aggregate
    // after a copy-on-write DELETE; the spj/pruning booleans are
    // counter evidence pinned TRUE
    "s43_dsv2_months_partitioned" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_after_dml, TRUE AS month_pruned
        |FROM orders WHERE NOT (o_orderkey % 10 = 7)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // TRUNCATE-WIDTH CLUSTERING: range-binned fact⋈fact SPJ on the
    // raw key; the DELETEd class is key ≡ 7 (mod 40); spj booleans
    // pinned TRUE
    "s44_dsv2_truncate_binned" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_shuffle_free, TRUE AS spj_after_dml
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE NOT (o_orderkey % 40 = 7)""".stripMargin,
    // MERGE-ON-READ UPDATE: vector-masked old versions + appended new
    // versions; the post-UPDATE aggregate recomputed relationally,
    // the no-rewrite booleans counter-pinned TRUE
    "s45_dsv2_mor_update" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 3
        |                     THEN o_totalprice + 1.0
        |                     ELSE o_totalprice END AS DECIMAL(18,2)))
        |         AS DOUBLE) AS sum_price,
        |       TRUE AS segments_preserved, TRUE AS updates_appended
        |FROM orders""".stripMargin,
    // ZERO-COPY CLONE: the post-DELETE aggregate over the hard-linked
    // clone; the all-linked and source-intact booleans pinned TRUE
    "s46_dsv2_clone" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS all_linked, TRUE AS source_intact
        |FROM orders WHERE NOT (o_orderkey % 10 = 3)""".stripMargin,
    // TYPE WIDENING: FLOAT→DOUBLE + DECIMAL(9,2)→DECIMAL(14,2) as
    // pure metadata, then a DELETE across the widen boundary; the
    // price column is dyadic quarters (k%16/4 — order-independent
    // exact sums), amt casts agree at either precision (same scale,
    // in-range), and the metadata-only/schema booleans pin TRUE
    "s47_dsv2_widen" ->
      """SELECT COUNT(*) AS n_rows,
        |       SUM(CAST(o_orderkey % 16 AS DOUBLE)/4) AS sum_price,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
        |         AS sum_amt,
        |       MIN(CAST(o_orderkey % 16 AS DOUBLE)/4) AS min_price,
        |       CAST(MAX(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
        |         AS max_amt,
        |       TRUE AS widen_metadata_only, TRUE AS schema_widened
        |FROM orders WHERE NOT (o_orderkey % 10 = 3)""".stripMargin,
    // NAMED SNAPSHOT TAGS: the aggregate reads VERSION AS OF the
    // pre-DELETE tag AFTER a keep_last=1 vacuum — the oracle
    // recomputing the FULL table proves the retention floor held
    "s48_dsv2_tag" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS tag_survived_vacuum, TRUE AS live_differs
        |FROM orders""".stripMargin,
    // Z-ORDER: Morton re-layout; each single-dimension aggregate
    // recomputes relationally, the counter booleans pin that BOTH
    // dimensions file-pruned on the z-laid table
    "s49_dsv2_zorder" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 97 = 7) AS n1,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM orders WHERE o_orderkey % 97 = 7) AS sum1,
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_custkey % 89 BETWEEN 10 AND 12) AS n2,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM orders WHERE o_custkey % 89 BETWEEN 10 AND 12) AS sum2,
        |  TRUE AS dim1_pruned, TRUE AS dim2_pruned""".stripMargin,
    // BINARY COLUMNS: opaque payloads in the table format; the
    // post-DELETE byte volume and exact distinct-payload count are
    // recomputed from the raw text (UTF-8 encode on both engines)
    "s50_dsv2_binary" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT)
        |         AS sum_bytes,
        |       COUNT(DISTINCT text) AS n_distinct_payloads,
        |       COUNT(DISTINCT lang) AS n_langs
        |FROM documents WHERE NOT (doc_id % 7 = 3)""".stripMargin,
    // MEDIA THROUGH THE TABLE FORMAT: deterministic payloads stored
    // as a gseg binary column, masked by a mor DELETE, format-sniffed
    // from the masked read; the oracle rebuilds the per-format tally
    // from the raw documents (byte-exact write/mask/read loop)
    "s51_dsv2_media" ->
      """SELECT CASE WHEN text IS NULL THEN 'unknown'
        |         ELSE CASE ((try_cast(substring(source, 4) AS INT) % 3)
        |                    + 3) % 3
        |           WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |           ELSE 'riff' END END AS detected_fmt,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CASE WHEN text IS NULL THEN NULL
        |                ELSE 4 + octet_length(encode(text)) END) AS BIGINT)
        |         AS total_bytes
        |FROM documents WHERE NOT (doc_id % 5 = 2)
        |GROUP BY 1""".stripMargin,
    // EMBEDDINGS IN THE TABLE FORMAT: the sim_cosine_topk kernel and
    // oracle over a gseg float-vector table after a merge-on-read
    // DELETE — scores/neighbors/ranks must match the oracle's
    // recomputation from the filtered parquet bit-exactly
    "s52_dsv2_embeddings" ->
      s"""WITH v AS (SELECT vec_id,
         |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings WHERE NOT (vec_id % 10 = 7)),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, vec_id, $cosSql AS cos
         |  FROM v CROSS JOIN q WHERE vec_id <> query_id)
         |SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rn AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, vec_id) AS rn FROM scored)
         |WHERE rn <= 5""".stripMargin,
    // DECIMAL(38) WEI ACCOUNTING: int128 decimal (tag 11) + the
    // metadata-only widen across the 18-digit boundary + COW DELETE;
    // SUM/MIN/MAX compared as exact STRINGS against DuckDB's
    // HUGEINT-backed 128-bit arithmetic — one lost low digit
    // anywhere in the long/int128 seam hash-mismatches
    "s53_dsv2_decimal38" ->
      """WITH t AS (
        |  SELECT o_orderkey AS k, CAST(o_custkey AS HUGEINT) AS wei
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey,
        |         CAST(o_orderkey AS HUGEINT) * 1000000000000000000
        |           + o_custkey
        |  FROM orders WHERE o_orderkey % 2 = 1
        |), live AS (SELECT * FROM t WHERE NOT (k % 10 = 3))
        |SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(wei) AS VARCHAR) AS sum_wei,
        |       CAST(MIN(wei) AS VARCHAR) AS min_wei,
        |       CAST(MAX(wei) AS VARCHAR) AS max_wei,
        |       (SELECT COUNT(*) FROM live
        |        WHERE wei >= 1000000000000000000) AS n_wide,
        |       TRUE AS widen_metadata_only, TRUE AS wide_pruned
        |FROM live""".stripMargin,
    // WRITABLE BRANCHES (WAP): fork, stage the odd half AND a
    // branch-scoped row-level DELETE (main byte-identical through
    // both), audit via plain in-session reads, fast-forward publish;
    // the aggregate over the PUBLISHED table is the full relational
    // result minus the branch-deleted class — the oracle proves the
    // whole staged cycle lost/duplicated nothing
    "s54_dsv2_branch_wap" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS main_untouched_during_wap, TRUE AS audit_saw_all,
        |       TRUE AS published_one_swap, TRUE AS history_labels_branch
        |FROM orders WHERE NOT (o_orderkey % 10 = 3)""".stripMargin,
    // PARTITION-SPEC EVOLUTION: set_clustering is metadata-only (new
    // segments only); each file prunes under its own layout on the
    // mixed table; compact migrates to the declared spec. Both
    // single-key aggregates recompute relationally.
    "s55_dsv2_spec_evolution" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 13 = 5) AS n1,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM orders WHERE o_orderkey % 13 = 5) AS sum1,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey % 11 = 7) AS n2,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM orders WHERE o_custkey % 11 = 7) AS sum2,
        |  TRUE AS spec_change_metadata_only, TRUE AS old_layout_pruned,
        |  TRUE AS new_layout_pruned, TRUE AS migration_incremental,
        |  TRUE AS compact_migrates""".stripMargin,
    // MULTI-COLUMN PARTITIONED BY: composite (k1,k2) clustering with
    // k1 = key%6, k2 = key%5 coprime — the DELETEd composite class is
    // key ≡ 27 (mod 30) by CRT, stated as the conjunction; the spj
    // booleans (zero-exchange before AND after DML) pinned TRUE
    "s37_dsv2_multi_partitioned" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       TRUE AS spj_shuffle_free, TRUE AS spj_after_dml
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE NOT (o_orderkey % 6 = 3 AND o_orderkey % 5 = 2)""".stripMargin,
    // atomic CTAS/RTAS: phase 0 = VERSION AS OF the pre-replace
    // generation (the even-key CTAS), phase 1 = the live table after
    // REPLACE (odd keys) — time travel provably reaches across the
    // replace
    "s34_dsv2_ctas" ->
      """SELECT CAST(0 AS BIGINT) AS phase, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), COUNT(*),
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |       MIN(o_orderkey), MAX(o_orderkey)
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY phase""".stripMargin,
    // RENAME COLUMN: generation 0 stores blocks under the old name,
    // generation 2 under the new one; the alias-resolved read makes
    // the rename invisible — the oracle is the plain filter+aggregate
    // over all orders
    "s33_dsv2_rename_column" ->
      """SELECT o_orderkey % 3 AS bucket, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_amount,
        |       MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
        |FROM orders WHERE o_totalprice > 1000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // COMPACT procedure: a distributed rewrite must not change the
    // data — the oracle is the plain even-key aggregate; layout_ok is
    // pinned TRUE (16 fragments in, 2 segments out)
    "s30_dsv2_compact" ->
      """SELECT o_orderkey % 3 AS bucket, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       MAX(o_orderkey) AS max_k,
        |       TRUE AS layout_ok
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TIME TRAVEL: version 0 is the full even-key table, version 1
    // (current) the table after deleting the k%4 residue class — the
    // snapshot must reproduce rows the live generation no longer has
    "s29_dsv2_time_travel" ->
      """SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       MAX(o_orderkey) AS max_k
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), COUNT(*),
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |       MAX(o_orderkey)
        |FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
        |ORDER BY version""".stripMargin,
    // DROP COLUMN: generation 1 was written WITH the dropped column
    // (its blocks stay in the old segments, unread); the oracle is
    // the plain two-generation projection — the dropped column never
    // appears, and every surviving value must read back exactly
    "s27_dsv2_drop_column" ->
      """SELECT o_orderkey % 3 AS bucket, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // UTF8_LCASE collation: the oracle states the same semantics with
    // lower() — grouping merges fabricated case variants, spellings
    // stay countable, predicates follow the collation
    "x21_collation_suite" ->
      """SELECT lower(brand_mixed) AS brand_lc,
        |       COUNT(*) AS n_parts,
        |       COUNT(DISTINCT brand_mixed) AS n_spellings,
        |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       MIN(p_partkey) AS min_key,
        |       CAST(SUM(CASE WHEN lower(brand_mixed) LIKE 'brand#1%'
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_b1x
        |FROM (SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_brand)
        |                  WHEN p_partkey % 3 = 1 THEN lower(p_brand)
        |                  ELSE p_brand END AS brand_mixed,
        |             p_retailprice, p_partkey
        |      FROM part)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // BFS hop distances; the oracle explores (node, dist) pairs under
    // UNION-dedup and MINs, the engine discovers each node once via
    // frontier anti-joins — identical distances
    "g4_shortest_path" ->
      """WITH RECURSIVE
        |li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |pr AS (SELECT a.p AS pa, b.p AS pb
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 1),
        |e AS (SELECT pa AS src, pb AS dst FROM pr
        |      UNION ALL SELECT pb, pa FROM pr),
        |walk(node, dist) AS (
        |  SELECT (SELECT MIN(src) FROM e), 0
        |  UNION
        |  SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.node
        |  WHERE walk.dist < 8)
        |SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
        |FROM walk GROUP BY 1""".stripMargin,
    // planted 16-bit PCM: the oracle evaluates the same mod-2^16
    // linear form; all-integer outputs
    "mm_wav_stats" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
        |         200 + doc_id % 300 AS n
        |  FROM documents),
        |x AS (SELECT doc_id, rate, n,
        |        ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
        |      FROM (SELECT doc_id, rate, n,
        |              unnest(generate_series(0, CAST(n AS INTEGER) - 1)) AS i
        |            FROM s))
        |SELECT doc_id, CAST(rate AS INTEGER) AS sample_rate,
        |       CAST(n AS BIGINT) AS n_samples,
        |       CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |       CAST(MAX(abs(v)) AS INTEGER) AS peak
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    // TPC-DS Q34 shape: band-sized carts, repeat customers
    "q34_frequent_carts" ->
      """WITH carts AS (
        |  SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem
        |  GROUP BY 1 HAVING COUNT(*) BETWEEN 5 AND 7)
        |SELECT o_custkey, COUNT(*) AS n_bulk_orders
        |FROM orders JOIN carts ON o_orderkey = l_orderkey
        |GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin,
    // winsorized mean: exact quantile_cont == percentile interpolation
    // (a22 parity); the clipped sum is exact DECIMAL on both engines
    "a28_winsorized_mean" ->
      """WITH p AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, 0.05) AS p05,
        |             quantile_cont(l_extendedprice, 0.95) AS p95
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        |  COUNT(CASE WHEN l_extendedprice < p05 OR l_extendedprice > p95
        |        THEN 1 END) AS n_clipped,
        |  round(CAST(SUM(CAST(least(greatest(l_extendedprice, p05), p95)
        |                      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
        |    AS wins_mean
        |FROM lineitem l JOIN p USING (l_returnflag) GROUP BY 1""".stripMargin,
    // gaps-and-islands: day minus per-user day-rank is constant on
    // consecutive runs
    "w11_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY day) AS INTEGER) AS grp
        |      FROM days)
        |SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
        |       COUNT(*) AS n_days
        |FROM g GROUP BY user_id, grp""".stripMargin,
    // sketch-pruned exact heavy hitters: the SpaceSaving candidate
    // superset is a pigeonhole theorem, so the thresholded counts are
    // exact under any partitioning and the oracle is plain SQL
    "a26_heavy_hitters" ->
      """WITH k AS (SELECT CASE WHEN event_id % 10 < 3 THEN user_id % 7
        |                       ELSE event_id + 7 END AS hkey
        |           FROM events)
        |SELECT hkey, COUNT(*) AS cnt FROM k GROUP BY 1
        |HAVING COUNT(*) >= ceil(0.01 * (SELECT COUNT(*) FROM events))""".stripMargin,
    // inclusion-exclusion audience overlap: the exact referee is the
    // value column; the sketch error bounds are in-engine booleans
    // (DuckDB's HLL is a different sketch)
    "a27_hll_intersection" ->
      """WITH b AS (SELECT user_id, COUNT(DISTINCT event_type) AS nt
        |           FROM events WHERE event_type IN ('click', 'view')
        |           GROUP BY 1)
        |SELECT COUNT(CASE WHEN nt = 2 THEN 1 END) AS exact_both,
        |       CAST(1 AS BOOLEAN) AS inter_within_err,
        |       CAST(1 AS BOOLEAN) AS union_within_err
        |FROM b""".stripMargin,
    // Jensen-Shannon drift between slices: exact counts, doubles only
    // in the division/log, same 0.5*SUM + 0.5*SUM fold order
    "text_jsd" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        |           FROM documents WHERE lang IN ('en', 'fr')),
        |c AS (SELECT lang, token, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM c GROUP BY 1),
        |a AS (SELECT token, c AS ca FROM c WHERE lang = 'en'),
        |b AS (SELECT token, c AS cb FROM c WHERE lang = 'fr'),
        |j AS (SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        |      FROM a FULL OUTER JOIN b ON a.token = b.token),
        |pq AS (SELECT ca / (SELECT tot FROM tot WHERE lang = 'en') AS p,
        |              cb / (SELECT tot FROM tot WHERE lang = 'fr') AS q
        |       FROM j),
        |terms AS (SELECT p, q, (p + q) / 2 AS m FROM pq)
        |SELECT round(SUM(CASE WHEN p > 0 THEN p * ln(p / m) END) * 0.5
        |           + SUM(CASE WHEN q > 0 THEN q * ln(q / m) END) * 0.5, 6)
        |         AS jsd,
        |       COUNT(*) AS vocab_union
        |FROM terms""".stripMargin,
    // Holt level+trend: the recursive CTE carries BOTH state columns;
    // alpha=0.5 / beta=0.25 are binary-exact so every multiply is
    // bit-reproducible
    "ev_holt" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, value, rn,
        |         value AS level, CAST(0.0 AS DOUBLE) AS trend
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.event_id, o.value, o.rn,
        |         0.5 * o.value + (1 - 0.5) * (r.level + r.trend),
        |         0.25 * ((0.5 * o.value + (1 - 0.5) * (r.level + r.trend))
        |                 - r.level) + (1 - 0.25) * r.trend
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, event_id, level, trend
        |FROM r""".stripMargin,
    // sequential recurrence: the recursive CTE replays the identical
    // alpha*x + (1-alpha)*prev double chain in (ts, event_id) order
    "ev_ewma" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, value, rn, value AS ewma
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.event_id, o.value, o.rn,
        |         0.2 * o.value + (1 - 0.2) * r.ewma
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, event_id, round(ewma, 6) AS ewma FROM r""".stripMargin,
    // planted semantic contamination (corpus_diff pattern): the eval
    // slice is vec_id%20==0, with every %40==0 member carrying train
    // vector vec_id+1's exact embedding; same left-to-right cosine
    // fold as the sim_* oracles, 6-decimal rounded on both engines
    "decon_semantic" ->
      s"""WITH v0 AS (SELECT vec_id,
         |              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |            FROM embeddings),
         |ev AS (SELECT e.vec_id AS eid, s.v AS qv
         |       FROM v0 e JOIN v0 s
         |         ON s.vec_id = CASE WHEN e.vec_id % 40 = 0
         |                            THEN e.vec_id + 1 ELSE e.vec_id END
         |       WHERE e.vec_id % 20 = 0),
         |tr AS (SELECT vec_id, v FROM v0 WHERE vec_id % 20 <> 0),
         |sc AS (SELECT tr.vec_id AS train_vec, ev.eid,
         |              round($cosSql, 6) AS cos6
         |       FROM tr CROSS JOIN ev)
         |SELECT train_vec, COUNT(*) AS n_eval_hits, MAX(cos6) AS max_cos
         |FROM sc WHERE cos6 >= 0.8 GROUP BY 1""".stripMargin,
    // recency order on epoch micros (not raw ts): the engine floors
    // nanos to micros, so the oracle must rank at the same precision
    "upsert_latest" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    // HLL union-vs-direct equality and the error bound are engine
    // properties (DuckDB's sketch differs); checked in-engine
    "a15_hll_merge" ->
      """SELECT CAST(1 AS BOOLEAN) AS merge_consistent,
        |       CAST(1 AS BOOLEAN) AS within_err""".stripMargin,
    "p2_dynamic_pruning" ->
      """WITH cal AS (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS y
        |             FROM orders WHERE year(o_orderdate) % 2 = 1)
        |SELECT f.o_year, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             o_totalprice FROM orders) f
        |JOIN cal ON f.o_year = cal.y
        |GROUP BY 1""".stripMargin,
    "j6_full_outer" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |                  COUNT(*) AS n_orders FROM orders GROUP BY 1),
        |l AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |             COUNT(*) AS n_shipped FROM lineitem GROUP BY 1)
        |SELECT COALESCE(o.day, l.day) AS day,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       COALESCE(n_shipped, 0) AS n_shipped
        |FROM o FULL OUTER JOIN l ON o.day = l.day""".stripMargin,
    "a16_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin,
    "x15_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(l, t -> len(t))) AS BIGINT)
        |    AS sum_tok_chars,
        |  CAST(len(list_filter(l, t -> len(t) > 4)) AS INTEGER) AS n_long,
        |  array_to_string(list_sort(list_distinct(
        |    list_filter(l, t -> len(t) > 4)))[1:3], ',') AS top_long
        |FROM t""".stripMargin,
    "w3_sliding_sum" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS roll_qty
        |FROM lineitem WHERE l_partkey % 50 = 0""".stripMargin,
    // one UNION ALL branch per profiled column; doubles go through
    // DECIMAL(18,2) before the VARCHAR cast (float formatting differs
    // between engines, decimal rendering doesn't)
    // Fingerprint canonicalization is ALL-INTEGER (money as cents,
    // timestamps as epoch days) and the SUM combiner is folded mod
    // 2^61-1 then cast to BIGINT, so neither engine ever renders a
    // float, decimal, or date, and every output column is plain int64
    // — no dtype class left for a driver-side hasher to diverge on.
    "table_fingerprint" ->
      s"""WITH r AS (
        |  SELECT md5($fpCanonSql) AS h
        |  FROM lineitem),
        |s AS (SELECT $fpSigFoldSql AS sig FROM r)
        |SELECT COUNT(*) AS n_rows, bit_xor(sig) AS xor_sig,
        |       CAST(SUM(sig % 2305843009213693951)
        |            % 2305843009213693951 AS BIGINT) AS sum_sig
        |FROM s""".stripMargin,
    // bucket = first 2 md5 bytes of the BUSINESS KEY (hex digits
    // decoded with portable ascii arithmetic) mod 64 — term-for-term
    // the engine's Profile.keyBucket
    "fingerprint_buckets" ->
      s"""WITH r AS (
        |  SELECT md5(concat_ws('|',
        |      coalesce(CAST(l_orderkey AS VARCHAR), ' '),
        |      coalesce(CAST(l_linenumber AS VARCHAR), ' '))) AS kh,
        |    md5($fpCanonSql) AS h
        |  FROM lineitem),
        |s AS (SELECT ($fpBucketFoldSql) % 64 AS bucket,
        |             $fpSigFoldSql AS sig FROM r)
        |SELECT bucket, COUNT(*) AS n_rows, bit_xor(sig) AS xor_sig,
        |       CAST(SUM(sig % 2305843009213693951)
        |            % 2305843009213693951 AS BIGINT) AS sum_sig
        |FROM s GROUP BY bucket""".stripMargin,
    "profile_orders" -> {
      def branch(c: String, expr: String = "") = {
        val e = if (expr.isEmpty) c else expr
        s"""SELECT '$c' AS col_name,
           |  COUNT(*) - COUNT($e) AS n_null,
           |  COUNT(DISTINCT $e) AS n_distinct,
           |  CAST(MIN($e) AS VARCHAR) AS min_val,
           |  CAST(MAX($e) AS VARCHAR) AS max_val FROM orders""".stripMargin
      }
      Seq(branch("o_orderkey"), branch("o_custkey"), branch("o_orderstatus"),
        branch("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
        branch("o_orderpriority")).mkString("\nUNION ALL\n")
    },
    // unrolled 16-bit Morton interleave — term-for-term the engine's
    // bit arithmetic
    "zorder_codes" -> {
      val terms = (0 until 16).map { i =>
        s"((((l_partkey & 65535) >> $i) & 1) << ${2 * i}) | " +
          s"((((l_suppkey & 65535) >> $i) & 1) << ${2 * i + 1})"
      }.mkString("(", ") | (", ")")
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CAST($terms AS BIGINT) AS zval
         |FROM lineitem WHERE l_orderkey < 400""".stripMargin
    },
    "j12_interval_overlap" ->
      """WITH c AS (SELECT c_mktsegment,
        |                  CAST(c_acctbal AS DECIMAL(12,2)) - 100 AS c_lo,
        |                  CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS c_hi
        |           FROM customer),
        |     s AS (SELECT s_suppkey,
        |                  CAST(s_acctbal AS DECIMAL(12,2)) AS s_bal,
        |                  CAST(s_acctbal AS DECIMAL(12,2)) - 100 AS s_lo,
        |                  CAST(s_acctbal AS DECIMAL(12,2)) + 100 AS s_hi
        |           FROM supplier)
        |SELECT c_mktsegment, COUNT(*) AS n_pairs,
        |       COUNT(DISTINCT s_suppkey) AS n_suppliers,
        |       CAST(CAST(SUM(s_bal) AS DECIMAL(18,2)) AS DOUBLE)
        |         AS sum_supp_bal
        |FROM c JOIN s ON c_lo <= s_hi AND s_lo <= c_hi
        |GROUP BY 1""".stripMargin,
    "range_join_binned" ->
      """WITH b AS (SELECT p_brand, MIN(p_retailprice) AS lo,
        |                  MAX(p_retailprice) AS hi
        |           FROM part GROUP BY 1)
        |SELECT b.p_brand, COUNT(*) AS n_in_band,
        |       CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM part p JOIN b ON p.p_retailprice >= b.lo
        |                  AND p.p_retailprice <= b.hi
        |GROUP BY 1""".stripMargin,
    "text_vocab_oov" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
        |vocab AS (SELECT token FROM (
        |  SELECT token, SUM(tf) AS n FROM tfc GROUP BY 1
        |  ORDER BY n DESC, token ASC LIMIT 50))
        |SELECT t.doc_id,
        |       CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN v.token IS NULL THEN t.tf ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       CAST(SUM(CASE WHEN v.token IS NULL THEN t.tf ELSE 0 END)
        |            AS DOUBLE) / SUM(t.tf) AS oov_rate
        |FROM tfc t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY 1""".stripMargin,
    "a18_count_min" ->
      """SELECT CAST(1 AS BOOLEAN) AS merged_within_bound,
        |       CAST(1 AS BOOLEAN) AS direct_within_bound,
        |       CAST(1 AS BOOLEAN) AS paths_agree""".stripMargin,
    "sim_semdedup" ->
      """SELECT CAST(1 AS BOOLEAN) AS verified_subset,
        |       CAST(1 AS BOOLEAN) AS recall_ok""".stripMargin,
    "p3_bloom_join" ->
      """SELECT CAST(1 AS BOOLEAN) AS bloom_in_plan,
        |       CAST(1 AS BOOLEAN) AS results_equal,
        |       (SELECT COUNT(DISTINCT o_orderkey)
        |        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |        WHERE o_orderpriority = '1-URGENT'
        |          AND o_totalprice < 10000) AS n_groups""".stripMargin,
    "a17_histogram" ->
      """SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS INTEGER)
        |         AS bucket,
        |       COUNT(*) AS n_orders,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,
    "w4_ntile_lead" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       c_acctbal - lead(c_acctbal, 1) OVER w AS gap_next
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "text_pii_scrub" ->
      """WITH r AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 <> 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
        |              '@example' || CAST(doc_id % 10 AS VARCHAR) || '.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN ' tel ' ||
        |              lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') ||
        |              '-' ||
        |              lpad(CAST(doc_id * 13 % 1000 AS VARCHAR), 3, '0') ||
        |              '-' ||
        |              lpad(CAST(doc_id * 31 % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(de_emailed,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(raw,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(de_emailed,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones
        |FROM (SELECT doc_id, raw,
        |        regexp_replace(raw,
        |          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g')
        |          AS de_emailed
        |      FROM r)""".stripMargin,
    // first-touch funnel with strict step ordering; the CTE chain
    // mirrors the engine's chained windows (min view ts, then min
    // click ts >= it, then min purchase ts >= that). The % 17 thin
    // gives the dense synthetic stream real drop-off — without it
    // every user completes every step and ordering bugs pass.
    "ev_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 17 = 0),
        |s1 AS (SELECT user_id,
        |         min(CASE WHEN event_type='view' THEN ts END) AS t1
        |       FROM ev GROUP BY user_id),
        |s2 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type='click' AND ts >= t1 THEN ts END) AS t2
        |       FROM ev e JOIN s1 USING(user_id) GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type='purchase' AND ts >= t2 THEN ts END) AS t3
        |       FROM ev e JOIN s2 USING(user_id) GROUP BY e.user_id)
        |SELECT count(*) AS n_users, count(t1) AS n_view,
        |       count(t2) AS n_view_click, count(t3) AS n_full_funnel
        |FROM s1 JOIN s2 USING(user_id) JOIN s3 USING(user_id)""".stripMargin,
    "ev_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day
        |          FROM days GROUP BY user_id)
        |SELECT cohort_day,
        |       count(CASE WHEN off = 0 THEN 1 END) AS n_users,
        |       count(CASE WHEN off = 1 THEN 1 END) AS d1_retained,
        |       count(CASE WHEN off = 7 THEN 1 END) AS d7_retained
        |FROM (SELECT f.cohort_day,
        |             date_diff('day', f.cohort_day, d.day) AS off
        |      FROM days d JOIN first f USING(user_id))
        |GROUP BY cohort_day""".stripMargin,
    "sample_cap_per_source" ->
      """SELECT source, doc_id, CAST(rn AS INTEGER) AS rank_in_source
        |FROM (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 10""".stripMargin,
    "text_inverted_index" ->
      """WITH td AS (SELECT DISTINCT doc_id,
        |              unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |ranked AS (SELECT term, doc_id,
        |             row_number() OVER (PARTITION BY term
        |                                ORDER BY doc_id) AS rn
        |           FROM td),
        |dfs AS (SELECT term, count(*) AS df FROM td GROUP BY term)
        |SELECT r.term, dfs.df,
        |       string_agg(r.doc_id, ',' ORDER BY r.doc_id) AS postings
        |FROM ranked r JOIN dfs USING (term)
        |WHERE rn <= 8
        |GROUP BY r.term, dfs.df""".stripMargin,
    // rebuilds the engine's deterministically-planted accents with
    // translate(), then strips with DuckDB's OWN strip_accents — two
    // independent Unicode-normalization implementations must agree
    // char-for-char (the ASCII third of docs checks the identity path)
    "text_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeiou', 'áéîöü')
        |         WHEN doc_id % 3 = 2 THEN translate(text, 'aeinc', 'àêíñç')
        |         ELSE text END AS raw
        |  FROM documents)
        |SELECT doc_id, strip_accents(raw) AS norm_text,
        |       raw <> strip_accents(raw) AS changed
        |FROM r""".stripMargin,
    // RANGE frame keyed by the order-by VALUE: same-day peers share the
    // frame, so no tie-break is needed (or possible) — the numeric day
    // ordering mirrors the engine's rangeBetween(-6, 0) literally
    "w5_range_frame" ->
      s"""SELECT o_custkey, o_orderkey, CAST(day AS INTEGER) AS day,
         |  CAST(SUM($decTotal) OVER (
         |    PARTITION BY o_custkey ORDER BY day
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS spend_7d
         |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
         |        date_diff('day', DATE '1990-01-01',
         |                  CAST(o_orderdate AS DATE)) AS day
         |      FROM orders)""".stripMargin,
    // five moments exactly in DECIMAL, one cast, identical closed-form
    // on both engines — same determinism recipe as ev_anomaly_zscore
    "a19_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x*y) AS DOUBLE) AS sxy,
        |    CAST(sum(x*x) AS DOUBLE) AS sxx,
        |    CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(18,4)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |        FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |    AS corr_qty_price
        |FROM m""".stripMargin,
    // explicit argmax: count desc, value asc — the window formulation
    // of the engine's min_by over a (-count, value) ordering struct
    "a20_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_val, c AS mode_n FROM (
        |  SELECT o_orderstatus, o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY c DESC, o_orderpriority ASC) AS rn
        |  FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS c
        |        FROM orders GROUP BY 1, 2))
        |WHERE rn = 1""".stripMargin,
    "ev_transitions" ->
      """WITH pairs AS (
        |  SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM (SELECT event_type,
        |          lag(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS from_type
        |        FROM events)
        |  WHERE from_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, sum(n) AS n_from FROM pairs
        |        GROUP BY from_type)
        |SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
        |       round(p.n / t.n_from, 6) AS p
        |FROM pairs p JOIN tot t USING (from_type)""".stripMargin,
    "w6_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    // grid = observed types × the generated day span (duckdb's date
    // generate_series yields TIMESTAMPs — cast back to DATE); missing
    // (type, day) cells surface as explicit zeros on both engines
    "ev_gap_fill" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day
        |            FROM events WHERE event_id % 401 = 0),
        |daily AS (SELECT event_type, day, count(*) AS n_events
        |          FROM ev GROUP BY event_type, day),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |grid AS (SELECT t.event_type, CAST(g.day AS DATE) AS day
        |         FROM (SELECT DISTINCT event_type FROM daily) t
        |         CROSS JOIN span,
        |         LATERAL (SELECT unnest(generate_series(
        |           CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |           INTERVAL 1 DAY)) AS day) g)
        |SELECT g.event_type, g.day,
        |       COALESCE(d.n_events, 0) AS n_events
        |FROM grid g LEFT JOIN daily d
        |  ON g.event_type = d.event_type AND g.day = d.day""".stripMargin,
    // the oracle rebuilds the identical derived "old" snapshot and
    // classifies through the same full-outer md5 comparison
    "corpus_diff" ->
      """WITH cur AS (SELECT doc_id, text FROM documents),
        |old AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' legacy' ELSE text END
        |      AS text
        |  FROM cur WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM cur
        |  WHERE doc_id % 13 = 0),
        |j AS (
        |  SELECT COALESCE(o.doc_id, c.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN c.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) <> md5(c.text) THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id)
        |SELECT status, count(*) AS n_docs,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM j GROUP BY status""".stripMargin,
    "ev_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS rn
        |           FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path ASC LIMIT 10""".stripMargin,
    // stats accumulate exactly in DECIMAL, cast to DOUBLE once, and the
    // identical IEEE mean/variance arithmetic runs on both engines — the
    // 3σ booleans are bit-reproducible, so counts compare exactly
    // the booleans are computed in-engine (no SQL oracle can run a
    // watermark); n_rows is the relational anchor — the deduped stream
    // must emit exactly the slice's distinct event ids
    "stream_dedup_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS dedup_parity,
        |       (SELECT COUNT(DISTINCT event_id) FROM events
        |        WHERE user_id < 50) AS n_rows""".stripMargin,
    "stream_neardup_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS neardup_parity,
        |       CAST(1 AS BOOLEAN) AS incremental_stream,
        |       (SELECT COUNT(*) FROM documents
        |        WHERE doc_id < 2000) AS n_rows""".stripMargin,
    // stream-stream join: the parity boolean is in-engine (stream
    // pair set == batch pair set); n_rows anchors relationally — the
    // oracle restates the same time-bounded view⋈click self-join
    "stream_join_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS join_parity,
        |       (SELECT COUNT(*) FROM events v JOIN events c
        |        ON v.user_id = c.user_id
        |        AND c.ts >= v.ts
        |        AND c.ts <= v.ts + INTERVAL '2 hours'
        |        WHERE v.event_type = 'view' AND c.event_type = 'click'
        |        AND v.user_id < 200) AS n_rows,
        |       CAST(1 AS BOOLEAN) AS rocksdb_state""".stripMargin,
    // left-outer stream-stream join: watermark-finalized null rows;
    // parity boolean in-engine, n_rows anchored by the oracle's
    // left-join count (every view survives)
    "stream_outer_join_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS outer_join_parity,
        |       (SELECT COUNT(*) FROM events v LEFT JOIN events c
        |        ON v.user_id = c.user_id AND c.event_type = 'click'
        |        AND c.ts >= v.ts
        |        AND c.ts <= v.ts + INTERVAL '2 hours'
        |        WHERE v.event_type = 'view' AND v.user_id < 200)
        |         AS n_rows,
        |       CAST(1 AS BOOLEAN) AS rocksdb_state""".stripMargin,
    // transformWithState running totals: parity boolean in-engine
    // (stream state totals == batch aggregate per user); n_users
    // anchors relationally
    "stream_tws_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS tws_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events
        |        WHERE user_id < 60) AS n_users,
        |       CAST(1 AS BOOLEAN) AS rocksdb_state""".stripMargin,
    // same processor, batch execution mode: parity frame pinned to
    // the identical slice-user count
    "tws_batch_unified" ->
      """SELECT CAST(1 AS BOOLEAN) AS tws_batch_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events
        |        WHERE user_id < 60) AS n_users""".stripMargin,
    // tws event-time timers: parity + flushed-is-last-session are
    // in-engine booleans; the timer-flush COUNT is relational (every
    // user's final session dangles, so flushes == distinct users) and
    // the session count reuses the lag/cumsum formulation
    "stream_tws_timer_parity" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS timer_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events
        |        WHERE user_id < 60) AS n_timer_flushed,
        |       CAST(SUM(CASE WHEN prev_us IS NULL
        |                       OR us - prev_us > 600000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x""".stripMargin,
    // tws checkpoint-restart recovery: totals parity + the
    // reprocessed-nothing input check are in-engine; user counts are
    // relational via the init gate's midpoint arithmetic
    "stream_tws_restart_parity" ->
      """WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
        |             AS cut
        |           FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS restart_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events, b
        |        WHERE user_id < 60 AND epoch_us(ts) > b.cut) AS n_users,
        |       (SELECT COUNT(DISTINCT e2.user_id) FROM events e2, b
        |        WHERE e2.user_id < 60 AND epoch_us(e2.ts) > b.cut
        |          AND EXISTS (SELECT 1 FROM events e1
        |                      WHERE e1.user_id = e2.user_id
        |                        AND e1.user_id < 60
        |                        AND epoch_us(e1.ts) <= b.cut))
        |         AS n_boot_users
        |FROM b""".stripMargin,
    // ListState last-K window: fully relational — the stream's
    // per-user output relation IS the compared result (event-time
    // order + integer cents make it engine-exact)
    "stream_lastk_parity" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                    AS cents
        |           FROM events WHERE user_id < 60),
        |r AS (SELECT user_id, cents,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY us DESC, event_id DESC) AS rn
        |      FROM e)
        |SELECT user_id,
        |       CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS lastk_n,
        |       CAST(SUM(CASE WHEN rn <= 5 THEN cents ELSE 0 END) AS BIGINT)
        |         AS lastk_cents
        |FROM r GROUP BY user_id""".stripMargin,
    // tws initial-state bootstrap: totals parity is in-engine; the
    // emitting-user and seeded-then-extended counts are relational,
    // sharing the gate's (MIN+MAX)//2 midpoint arithmetic exactly
    "stream_tws_init_parity" ->
      """WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
        |             AS cut
        |           FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS init_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events, b
        |        WHERE user_id < 60 AND epoch_us(ts) > b.cut) AS n_users,
        |       (SELECT COUNT(DISTINCT e2.user_id) FROM events e2, b
        |        WHERE e2.user_id < 60 AND epoch_us(e2.ts) > b.cut
        |          AND EXISTS (SELECT 1 FROM events e1
        |                      WHERE e1.user_id = e2.user_id
        |                        AND e1.user_id < 60
        |                        AND epoch_us(e1.ts) <= b.cut))
        |         AS n_boot_users
        |FROM b""".stripMargin,
    // stream-static enrichment join: pair parity is in-engine; the
    // row count is relational (left join against the unique-key
    // customer dim preserves events) and the users-in-both-batches
    // count shares the init/restart gates' midpoint arithmetic
    "stream_static_join_parity" ->
      """WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
        |             AS cut
        |           FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS static_join_parity,
        |       (SELECT COUNT(*) FROM events WHERE user_id < 60) AS n_rows,
        |       (SELECT COUNT(DISTINCT e2.user_id) FROM events e2, b
        |        WHERE e2.user_id < 60 AND epoch_us(e2.ts) > b.cut
        |          AND EXISTS (SELECT 1 FROM events e1
        |                      WHERE e1.user_id = e2.user_id
        |                        AND e1.user_id < 60
        |                        AND epoch_us(e1.ts) <= b.cut))
        |         AS n_multi_batch_users
        |FROM b""".stripMargin,
    // statestore batch reader: value/map state parity booleans are
    // in-engine; the state tables' CARDINALITIES are relational —
    // one ValueState row per user, one MapState row per (user, type)
    "stream_state_reader" ->
      """SELECT CAST(1 AS BOOLEAN) AS state_reader_parity,
        |       (SELECT COUNT(DISTINCT user_id) FROM events
        |        WHERE user_id < 60) AS n_users,
        |       (SELECT COUNT(*) FROM (SELECT DISTINCT user_id, event_type
        |                              FROM events WHERE user_id < 60))
        |         AS n_type_entries""".stripMargin,
    // statestore change feed: the three parity axes (intermediate,
    // final, per-batch key sets) are in-engine; the changelog's
    // cardinality (one commit per half-slice user) and the straddler
    // count are relational via the family's midpoint arithmetic
    "stream_state_changefeed" ->
      """WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
        |             AS cut
        |           FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS changefeed_parity,
        |       CAST((SELECT COUNT(DISTINCT user_id) FROM events, b
        |             WHERE user_id < 60 AND epoch_us(ts) <= b.cut)
        |          + (SELECT COUNT(DISTINCT user_id) FROM events, b
        |             WHERE user_id < 60 AND epoch_us(ts) > b.cut)
        |         AS BIGINT) AS n_changes,
        |       (SELECT COUNT(DISTINCT e2.user_id) FROM events e2, b
        |        WHERE e2.user_id < 60 AND epoch_us(e2.ts) > b.cut
        |          AND EXISTS (SELECT 1 FROM events e1
        |                      WHERE e1.user_id = e2.user_id
        |                        AND e1.user_id < 60
        |                        AND epoch_us(e1.ts) <= b.cut))
        |         AS n_straddlers
        |FROM b""".stripMargin,
    "stream_quantile_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS quantile_parity,
        |       CAST(2 AS BIGINT) AS n_batches,
        |       (SELECT COUNT(*) FROM orders
        |        WHERE o_totalprice IS NOT NULL) AS n_rows""".stripMargin,
    // gseg micro-batch source: parity booleans in-engine, group count
    // anchored relationally
    "stream_dsv2_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS first_batch_parity,
        |       CAST(1 AS BOOLEAN) AS final_parity,
        |       (SELECT COUNT(DISTINCT event_type) FROM events
        |        WHERE user_id < 40) AS n_types""".stripMargin,
    // generation-offset stream source (catalog tables): parity +
    // snapshot-diff-increment booleans in-engine, type count anchored
    // relationally
    "stream_gseg_gen_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS first_batch_parity,
        |       CAST(1 AS BOOLEAN) AS final_parity,
        |       CAST(1 AS BOOLEAN) AS increment_exact,
        |       (SELECT COUNT(DISTINCT event_type) FROM events
        |        WHERE user_id < 40) AS n_types""".stripMargin,
    // streaming row-level changefeed: lifecycle booleans (initial
    // snapshot, exactly-once pre/post pairs across a restart, replay
    // identity) in-engine; the change-log cardinalities anchored
    // relationally with the same halving arithmetic the gate uses
    "stream_gseg_cdf_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS first_parity,
        |       CAST(1 AS BOOLEAN) AS update_exactly_once,
        |       CAST(1 AS BOOLEAN) AS replay_parity,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 40 AND event_id % 2 = 0) AS n_initial,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 20 AND event_id % 2 = 0) AS n_update_pairs,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 40 AND event_id % 2 = 1) AS n_late_inserts
        |""".stripMargin,
    // merge-on-read DELETE through the streaming changefeed: the
    // lifecycle booleans (initial snapshot, exactly-once deletes
    // across a restart, segments untouched by the vector commit,
    // replay identity) in-engine; cardinalities anchored relationally
    "stream_dv_cdf_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS first_parity,
        |       CAST(1 AS BOOLEAN) AS delete_exactly_once,
        |       CAST(1 AS BOOLEAN) AS dv_commit,
        |       CAST(1 AS BOOLEAN) AS replay_parity,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 40 AND event_id % 2 = 0) AS n_initial,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 20 AND event_id % 2 = 0) AS n_deleted,
        |       (SELECT COUNT(*) FROM events
        |        WHERE user_id < 40 AND event_id % 2 = 1) AS n_late_inserts
        |""".stripMargin,
    // CDF → LSH index maintenance: the incremental index's final
    // cardinality is 32 bands per >=3-token LIVE doc — DuckDB
    // recomputes the live state (inserted quarters, updated texts,
    // deleted class) and the band arithmetic; parity booleans pinned
    // TRUE (index == from-scratch rebuild, across a restart)
    "stream_cdf_index_parity" ->
      """SELECT COUNT(*) AS n_docs,
        |       CAST(32 * COUNT(*) FILTER
        |         (WHERE len(string_split(text, ' ')) >= 3) AS BIGINT)
        |         AS n_index_rows,
        |       TRUE AS index_matches_rebuild,
        |       TRUE AS incremental_applied
        |FROM (SELECT CASE WHEN doc_id % 10 = 3 THEN text || ' touched'
        |             ELSE text END AS text
        |      FROM documents
        |      WHERE doc_id % 4 IN (0, 1) AND doc_id % 10 <> 7)""".stripMargin,
    // gseg streaming SINK: parity + epoch-commit + DML-interplay
    // booleans in-engine, type count anchored relationally
    "stream_gseg_sink_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS first_batch_parity,
        |       CAST(1 AS BOOLEAN) AS final_parity,
        |       CAST(1 AS BOOLEAN) AS multi_epoch,
        |       CAST(1 AS BOOLEAN) AS dml_ok,
        |       (SELECT COUNT(DISTINCT event_type) FROM events
        |        WHERE user_id < 40) AS n_types""".stripMargin,
    // gseg limit/TopN pushdown: row count and top-k value sum are
    // relational (the top-50 VALUE multiset is tie-deterministic, and
    // the sum rides decimal on both engines); the pushdown-evidence
    // booleans (plan string, planner skip counters) are in-engine
    "s16_dsv2_limit_topn" ->
      """SELECT CAST(1 AS BOOLEAN) AS limit_pushed,
        |       CAST(1 AS BOOLEAN) AS limit_skipped,
        |       (SELECT LEAST(COUNT(*), 100) FROM orders) AS n_limit,
        |       CAST(1 AS BOOLEAN) AS topn_pushed,
        |       CAST(1 AS BOOLEAN) AS topn_skipped,
        |       (SELECT CAST(SUM(v) AS DOUBLE) FROM
        |          (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |           FROM orders ORDER BY o_totalprice DESC LIMIT 50))
        |         AS topk_sum""".stripMargin,
    // gseg runtime (DPP) filtering: the join aggregate is relational;
    // the predicate-arrival and segment-skip booleans are in-engine
    "s17_dsv2_runtime_filter" ->
      """WITH dim AS (SELECT DISTINCT user_id, user_id // 16 AS grp
        |             FROM events)
        |SELECT CAST(1 AS BOOLEAN) AS runtime_pushed,
        |       CAST(1 AS BOOLEAN) AS files_skipped,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value
        |FROM events e JOIN dim ON e.user_id = dim.user_id
        |WHERE dim.grp = 0""".stripMargin,
    // gseg storage-partitioned join: the join aggregate is relational
    // (k is derived from the join key, so the plain orderkey join
    // states the same result); the key-grouped-planning and
    // no-shuffle-below-the-join booleans are in-engine plan evidence
    "s18_dsv2_spj_join" ->
      """SELECT CAST(1 AS BOOLEAN) AS spj_join,
        |       CAST(1 AS BOOLEAN) AS spj_shuffle_free,
        |       CAST(1 AS BOOLEAN) AS spj_aqe_join,
        |       CAST(1 AS BOOLEAN) AS spj_aqe_shuffle_free,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
    // agg-pushdown/SPJ degrade: plan-evidence booleans in-engine; the
    // header-served aggregate values are relational (proving the
    // headers answer with the TRUE count/min/max)
    "s19_dsv2_agg_degrade" ->
      """SELECT CAST(1 AS BOOLEAN) AS agg_pushed,
        |       CAST(1 AS BOOLEAN) AS spj_declined,
        |       COUNT(*) AS n_rows,
        |       MIN(o_orderkey) AS min_key,
        |       MAX(o_orderkey) AS max_key
        |FROM orders""".stripMargin,
    // chunked-scan precision contract: the booleans compare the
    // two-phase affine scan against the single-task fold IN-ENGINE
    // (no SQL oracle can replay the composed-carry float sequence);
    // n_rows anchors the join cardinality relationally
    "ev_scan_gate" ->
      """SELECT CAST(1 AS BOOLEAN) AS ewma_round6_exact,
        |       CAST(1 AS BOOLEAN) AS holt_within_tol,
        |       CAST(1 AS BOOLEAN) AS multi_chunk,
        |       (SELECT COUNT(*) FROM events) AS n_rows""".stripMargin,
    "compact_small_files" ->
      """SELECT CAST(1 AS BOOLEAN) AS content_equal,
        |       CAST(1 AS BOOLEAN) AS layout_ok,
        |       (SELECT COUNT(*) FROM orders) AS n_rows""".stripMargin,
    // rebuilds the planted URLs, then re-extracts host/path/query with
    // plain regexes — an independent implementation of the same parse
    "text_url_extract" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://h' || CAST(doc_id % 20 AS VARCHAR) ||
        |    '.example' || CAST(doc_id % 7 AS VARCHAR) || '.com/p/' ||
        |    CAST(doc_id % 5 AS VARCHAR) || '?q=' || lang AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)', 1) AS query
        |FROM u""".stripMargin,
    // first-occurrence keeper = row_number 1 over (doc_id, pidx) —
    // the oracle's window formulation of the engine's min(struct);
    // COALESCE('') matches concat-of-empty for fully-duplicated docs
    "dedup_paragraph" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |paras0 AS (
        |  SELECT doc_id, t,
        |         unnest(range(1, CAST(ceil(len(t) / 10.0) AS BIGINT) + 1))
        |           AS pidx
        |  FROM toks),
        |paras AS (
        |  SELECT doc_id, pidx,
        |         array_to_string(t[(pidx-1)*10+1 : (pidx-1)*10+10], ' ')
        |           AS para
        |  FROM paras0),
        |keep AS (SELECT para, doc_id AS kdoc, pidx AS kidx FROM (
        |  SELECT para, doc_id, pidx,
        |         row_number() OVER (PARTITION BY para
        |                            ORDER BY doc_id, pidx) AS rn
        |  FROM paras) WHERE rn = 1)
        |SELECT p.doc_id, count(*) AS n_paras,
        |  count(CASE WHEN p.doc_id = k.kdoc AND p.pidx = k.kidx
        |        THEN 1 END) AS n_kept,
        |  COALESCE(string_agg(
        |    CASE WHEN p.doc_id = k.kdoc AND p.pidx = k.kidx THEN p.para END,
        |    ' ' ORDER BY p.pidx), '') AS kept_text
        |FROM paras p JOIN keep k USING(para)
        |GROUP BY p.doc_id""".stripMargin,
    "text_surprisal" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |ct AS (SELECT term, sum(tf) AS ct FROM tf GROUP BY term),
        |tot AS (SELECT sum(tf) AS t_total FROM tf)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(-(sum(tf * ln(CAST(ct AS DOUBLE) / t_total)) / sum(tf)), 6)
        |    AS avg_surprisal
        |FROM tf JOIN ct USING(term) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,
    "ev_anomaly_zscore" ->
      """WITH ev AS (SELECT event_type, value,
        |              CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |st AS (SELECT event_type, count(*) AS n,
        |         CAST(sum(v) AS DOUBLE) AS sd,
        |         CAST(sum(v*v) AS DOUBLE) AS s2d
        |       FROM ev GROUP BY event_type)
        |SELECT e.event_type, max(n) AS n_events,
        |       round(max(sd / n), 6) AS mean_value,
        |       count(CASE WHEN abs(value - sd / n) >
        |         3.0 * sqrt((s2d - sd * sd / n) / n) THEN 1 END)
        |         AS n_anomalies
        |FROM ev e JOIN st USING(event_type)
        |GROUP BY e.event_type""".stripMargin,
    // The naive inequality-join + argmin oracle; the engine computes
    // the same relation with one union-and-scan shuffle. Purchases are
    // deduped to MIN event_id per (user, ts) on both sides so the
    // forward tie rule never fires.
    "asof_next_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts AS purchase_ts, MIN(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |clicks AS (
        |  SELECT event_id AS click_id, user_id, ts
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT c.click_id, p.purchase_id,
        |         epoch_us(p.purchase_ts) AS purchase_us,
        |         row_number() OVER (PARTITION BY c.click_id
        |           ORDER BY p.purchase_ts, p.purchase_id) AS rn
        |  FROM clicks c JOIN purchases p
        |    ON c.user_id = p.user_id AND p.purchase_ts >= c.ts
        |   AND epoch_us(p.purchase_ts) - epoch_us(c.ts) <= 43200000000)
        |SELECT c.click_id, c.user_id, epoch_us(c.ts) AS click_us,
        |       k.purchase_id, k.purchase_us,
        |       k.purchase_us - epoch_us(c.ts) AS gap_us
        |FROM clicks c
        |LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k USING (click_id)""".stripMargin,
    "scd2_intervals" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT user_id, ts, event_id, event_type FROM ordered
        |  WHERE prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |       CAST(row_number() OVER w AS INTEGER) AS version,
        |       epoch_us(ts) AS valid_from_us,
        |       epoch_us(lead(ts) OVER w) AS valid_to_us
        |FROM changes
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // Each event lands in exactly two 10-min/5-min-slide windows; the
    // oracle enumerates both epoch-aligned covering starts per event.
    "ev_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |         UNNEST([(epoch_us(ts) // 300000000) * 300000000,
        |                 (epoch_us(ts) // 300000000) * 300000000
        |                   - 300000000]) AS win_start_us
        |  FROM events)
        |SELECT win_start_us, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2""".stripMargin,
    "text_gopher_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(len(tk) AS INTEGER) AS n_tokens,
        |        CAST(list_sum(list_transform(tk, x -> len(x))) AS BIGINT)
        |          / len(tk) AS mean_wlen,
        |        list_max(list_transform(list_distinct(tk),
        |          x -> len(list_filter(tk, y -> y = x)))) / len(tk) AS top_frac
        |      FROM t)
        |SELECT doc_id, n_tokens, mean_wlen, top_frac,
        |       (n_tokens BETWEEN 20 AND 90)
        |         AND (mean_wlen BETWEEN 3.8 AND 5.2)
        |         AND top_frac <= 0.12 AS keep
        |FROM s""".stripMargin,
    // Parallel UNNESTs zip in DuckDB: (dim, value) pairs per vector
    "emb_centroid" ->
      """WITH e AS (SELECT label,
        |             UNNEST(range(len(embedding))) AS dim,
        |             UNNEST(list_transform(embedding,
        |               x -> CAST(x AS DOUBLE))) AS x
        |           FROM embeddings)
        |SELECT label, CAST(dim AS INTEGER) AS dim,
        |       AVG(x) AS mean_x, COUNT(*) AS n
        |FROM e GROUP BY 1, 2""".stripMargin,
    "w7_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w_grow AS first_order,
        |       last_value(o_orderkey) OVER w_full AS last_order,
        |       nth_value(o_orderkey, 2) OVER w_full AS second_order
        |FROM orders
        |WINDOW w_grow AS (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey),
        |       w_full AS (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND UNBOUNDED FOLLOWING)""".stripMargin,
    "j7_null_safe_join" ->
      """WITH o AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |                  ELSE o_orderpriority END AS prio, o_orderstatus
        |           FROM orders),
        |a AS (SELECT prio, COUNT(*) AS n_open FROM o
        |      WHERE o_orderstatus = 'O' GROUP BY prio),
        |b AS (SELECT prio, COUNT(*) AS n_closed FROM o
        |      WHERE o_orderstatus = 'F' GROUP BY prio)
        |SELECT a.prio, n_open, n_closed
        |FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio""".stripMargin,
    "a21_filtered_agg" ->
      """SELECT l_returnflag,
        |       COUNT(*) AS n_items,
        |       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |         FILTER (WHERE l_discount > 0.05) AS DOUBLE)
        |         AS sum_discounted,
        |       COUNT(*) FILTER (WHERE year(l_shipdate) = 1995) AS n_1995
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a22_percentile_cont" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |       round(quantile_cont(o_totalprice, 0.75), 6) AS p75
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // MERGE-INTO semantics: snapshot = first-half latest of users<120,
    // changes = second-half latest of users>=30, delete = value<5
    "merge_upsert" ->
      """WITH b0 AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
        |              AS mid FROM events),
        |base AS (SELECT user_id, ts_us, event_id, event_type, value FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events, b0 WHERE epoch_us(ts) <= mid AND user_id < 120)
        |  WHERE rn = 1),
        |chg AS (SELECT user_id, ts_us, event_id, event_type, value,
        |               value < 5 AS is_delete FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events, b0 WHERE epoch_us(ts) > mid AND user_id >= 30)
        |  WHERE rn = 1)
        |SELECT COALESCE(c.user_id, b.user_id) AS user_id,
        |       COALESCE(c.ts_us, b.ts_us) AS ts_us,
        |       COALESCE(c.event_id, b.event_id) AS event_id,
        |       COALESCE(c.event_type, b.event_type) AS event_type,
        |       COALESCE(c.value, b.value) AS value,
        |       CASE WHEN c.user_id IS NULL THEN 'keep'
        |            WHEN b.user_id IS NULL THEN 'insert'
        |            ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
        |WHERE c.user_id IS NULL OR NOT c.is_delete""".stripMargin,
    "s9_partitioned_sink" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang""".stripMargin,
    // gen-1 rows (even ids) predate the lang column: the merged read
    // must null-fill them, so they all land in the NULL group
    "s10_schema_evolution" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // stream==batch equality is engine-internal (no SQL oracle can run
    // a micro-batched merge); the row count anchors it relationally
    "stream_upsert_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS upsert_parity,
        |       COUNT(DISTINCT user_id) AS n_rows
        |FROM events WHERE user_id < 60""".stripMargin,
    "stream_availablenow_parity" ->
      """SELECT CAST(1 AS BOOLEAN) AS availablenow_parity,
        |       COUNT(*) AS n_rows
        |FROM events WHERE user_id < 80""".stripMargin,
    "p4_nested_pruning" ->
      """SELECT etype, COUNT(*) AS n_events, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type AS etype,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events)
        |WHERE k >= 50 GROUP BY etype""".stripMargin,
    // booleans vs constants; n_groups recomputed relationally — the
    // priorities reachable through the collapsed hot key (orderkey 1)
    // plus the surviving tail keys (orderkey % 10 = 9) with lineitems
    "skew_aqe_join" ->
      """SELECT CAST(1 AS BOOLEAN) AS skew_join_applied,
        |       CAST(1 AS BOOLEAN) AS results_equal,
        |       (SELECT COUNT(DISTINCT o.o_orderpriority) FROM orders o
        |        WHERE (o.o_orderkey = 1
        |               AND EXISTS (SELECT 1 FROM lineitem
        |                           WHERE l_orderkey % 10 < 9))
        |           OR (o.o_orderkey % 10 = 9
        |               AND EXISTS (SELECT 1 FROM lineitem l
        |                           WHERE l.l_orderkey = o.o_orderkey)))
        |         AS n_groups""".stripMargin,
    "j8_exists_correlated" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_customers,
        |       COUNT(CASE WHEN has_urgent THEN 1 END) AS n_with_urgent
        |FROM (SELECT c_custkey, c_mktsegment,
        |             EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_custkey = c.c_custkey
        |                       AND o.o_orderpriority = '1-URGENT')
        |               AS has_urgent
        |      FROM customer c)
        |GROUP BY c_mktsegment""".stripMargin,
    "a23_string_agg" ->
      """SELECT o_orderstatus,
        |       array_to_string(list_sort(list_distinct(
        |         list(o_orderpriority))), ',') AS priorities,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "ev_window_users" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
        |       event_type,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "x16_regexp_suite" ->
      """SELECT p_partkey,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |       regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |       CAST(length(regexp_replace(p_name, '[^ ]', '', 'g'))
        |         AS INTEGER) AS n_spaces
        |FROM part""".stripMargin,
    // size=32, stride=24 (8-token overlap); final partial window kept
    "text_chunk_overlap" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n,
        |        CASE WHEN n <= 32 THEN 1
        |             ELSE (n - 32 + 23) // 24 + 1 END AS n_chunks
        |      FROM t),
        |x AS (SELECT doc_id, n, UNNEST(range(n_chunks)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id, chunk_id * 24 AS start_tok,
        |       least(chunk_id * 24 + 32, n) AS end_tok
        |FROM x""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS o_orderdate,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |         AS o_price,
        |       CAST(total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    // parallel UNNESTs zip; list slices are 1-based inclusive
    "text_bigrams" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT UNNEST(t[1:len(t)-1]) AS w1,
        |              UNNEST(t[2:len(t)]) AS w2 FROM tk),
        |cnt AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
        |den AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS d FROM cnt GROUP BY 1)
        |SELECT c.w1, c.w2, c.n, round(c.n / d, 6) AS p
        |FROM cnt c JOIN den USING (w1)
        |ORDER BY c.n DESC, c.w1 ASC, c.w2 ASC
        |LIMIT 50""".stripMargin,
    // the magic prefix is a deterministic function of the source id,
    // so the tally is predictable without reconstructing blobs; the
    // engine's answer still travelled bytes -> slice -> hex -> classify
    // ((x%3)+3)%3 mirrors Spark's pmod (sign-following % would diverge
    // on a negative source suffix); NULL text mirrors the engine's
    // NULL-payload -> 'unknown' classification
    "mm_format_detect" ->
      """SELECT source,
        |       CASE WHEN text IS NULL THEN 'unknown'
        |         ELSE CASE ((try_cast(substring(source, 4) AS INT) % 3)
        |                    + 3) % 3
        |           WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |           ELSE 'riff' END END AS detected_fmt,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(4 + octet_length(encode(text))) AS BIGINT)
        |         AS total_bytes
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "a24_stddev" ->
      """WITH m AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |           AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))
        |                * CAST(o_totalprice AS DECIMAL(28,6)))
        |           AS DOUBLE) AS sxx
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, n,
        |       round(greatest(0, (sxx - sx * sx / n) / (n - 1)), 4)
        |         AS var_samp,
        |       round(sqrt(greatest(0, (sxx - sx * sx / n) / (n - 1))), 6)
        |         AS stddev_samp
        |FROM m""".stripMargin,
    // Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6
    "x17_datetime_suite" ->
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0
        |           FROM orders)
        |SELECT o_orderkey, d0,
        |       d0 + 30 AS plus30,
        |       CAST(d0 + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        |       last_day(d0) AS month_end,
        |       CAST(date_trunc('month', d0) AS DATE) AS month_start,
        |       CAST(datediff('day', d0, DATE '1998-12-31') AS INTEGER)
        |         AS days_to_end,
        |       CAST(dayofweek(d0) + 1 AS INTEGER) AS dow,
        |       CAST(quarter(d0) AS INTEGER) AS qtr
        |FROM t""".stripMargin,
    "j9_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT
        |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
        |    AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a
        |     INTERSECT SELECT * FROM b)) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a
        |     EXCEPT SELECT * FROM b)) AS n_except,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a
        |     UNION ALL SELECT * FROM b)) AS n_union_all""".stripMargin,
    "t5_limit_offset" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY price DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 40""".stripMargin,
    "g1_recursive_reach" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT DISTINCT event_type AS src, next_type AS dst FROM (
        |    SELECT event_type,
        |           lead(event_type) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS next_type
        |    FROM events)
        |  WHERE next_type IS NOT NULL),
        |reach(node, depth) AS (
        |  SELECT 'view', 0
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON e.src = r.node
        |  WHERE r.depth < 4)
        |SELECT node, CAST(MIN(depth) AS INTEGER) AS min_depth,
        |       COUNT(*) AS n_walks
        |FROM reach GROUP BY node""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "j10_not_in" ->
      """SELECT c_mktsegment, COUNT(*) AS n_never_f
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,
    "w8_forward_fill" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |       CASE WHEN value >= 5 THEN value END AS raw_value,
        |       last_value(CASE WHEN value >= 5 THEN value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS filled
        |FROM events""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q17_small_qty" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |                  AS DOUBLE) / 7.0, 6) AS avg_yearly,
        |       COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < 0.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
        |                          WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q20_potential_promo" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'small%')
        |    AND l1.l_shipdate >= TIMESTAMP '2001-01-01'
        |    AND l1.l_quantity > 1.9 * (SELECT AVG(l2.l_quantity)
        |                               FROM lineitem l2
        |                               WHERE l2.l_partkey = l1.l_partkey))""".stripMargin,
    "q21_waiting_supp" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin,
    "q2_min_cost_supp" ->
      """SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name
        |FROM part p
        |JOIN lineitem l ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_size = 10
        |  AND l.l_extendedprice / l.l_quantity =
        |      (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |       FROM lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(rev_dec AS DOUBLE) AS revenue FROM (
         |  SELECT c_custkey, c_name, n_name,
         |         SUM($decPrice * $decDisc) AS rev_dec
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1996-04-01'
         |    AND l_returnflag = 'R'
         |  GROUP BY c_custkey, c_name, n_name
         |  ORDER BY rev_dec DESC, c_custkey ASC LIMIT 20)""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT round(100.0 *
         |  CAST(SUM(CASE WHEN p_type = 'PROMO'
         |               THEN $decPrice * $decDisc ELSE 0 END) AS DOUBLE)
         |  / CAST(SUM($decPrice * $decDisc) AS DOUBLE), 6) AS promo_share
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(volume) AS DOUBLE) AS revenue
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |        CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |        $decPrice * $decDisc AS volume
         |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         |      JOIN orders ON o_orderkey = l_orderkey
         |      JOIN customer ON c_custkey = o_custkey
         |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
         |            AND TIMESTAMP '1996-12-31')
         |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      s"""SELECT o_year,
         |  round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
         |                 ELSE 0 END) AS DOUBLE)
         |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
         |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |        $decPrice * $decDisc AS volume, n2.n_name AS nation
         |      FROM part JOIN lineitem ON p_partkey = l_partkey
         |      JOIN supplier ON s_suppkey = l_suppkey
         |      JOIN orders ON o_orderkey = l_orderkey
         |      JOIN customer ON c_custkey = o_custkey
         |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |      JOIN region ON n1.n_regionkey = r_regionkey
         |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
         |GROUP BY o_year""".stripMargin,
    "q6_forecast_revenue" ->
      s"""SELECT CAST(SUM($decPrice * CAST(l_discount AS DECIMAL(18,2)))
         |            AS DOUBLE) AS revenue,
         |       COUNT(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT nation, o_year, round(CAST(SUM(amount) AS DOUBLE), 6)
         |         AS sum_profit
         |FROM (SELECT n_name AS nation,
         |        CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |        $decPrice * $decDisc -
         |          CAST(p_retailprice AS DECIMAL(18,2)) *
         |          CAST(l_quantity AS DECIMAL(18,0)) AS amount
         |      FROM part JOIN lineitem ON p_partkey = l_partkey
         |      JOIN supplier ON s_suppkey = l_suppkey
         |      JOIN orders ON o_orderkey = l_orderkey
         |      JOIN nation ON s_nationkey = n_nationkey
         |      WHERE p_name LIKE '%red%')
         |GROUP BY nation, o_year""".stripMargin,
    "q12_ship_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS revenue,
         |       COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q11_important_stock" ->
      s"""SELECT l_partkey, CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS value
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |GROUP BY l_partkey
         |HAVING SUM($decPrice * $decDisc) > (
         |  SELECT SUM($decPrice * $decDisc) * CAST(0.0002 AS DECIMAL(6,4))
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3')""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         SUM($decPrice * $decDisc) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin,
    "q16_parts_supplier" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#4'
        |  AND p_type NOT LIKE 'ECONOMY%'
        |  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q22_global_sales" ->
      """WITH pool AS (
        |  SELECT substring(c_name, 17, 2) AS cntrycode,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_custkey
        |  FROM customer
        |  WHERE substring(c_name, 17, 2)
        |        IN ('11','83','34','03','02','35','50')),
        |stats AS (SELECT SUM(bal) AS s, COUNT(*) AS n FROM pool WHERE bal > 0)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |       CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM pool, stats
        |WHERE bal * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY cntrycode""".stripMargin,
    "g2_pagerank" -> pagerankOracle(8),
    // name-lexicographic three-way self-join enumerates the identical
    // triangle set the engine's degree-ordered wedges produce
    // plain self-join + HAVING: the engine's apriori pruning is a pure
    // optimization and must reproduce exactly this result
    "mb_frequent_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |       count(*) AS support
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "a25_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |    SUM(l_quantity) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS amount FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', sum_disc FROM w""".stripMargin,
    // brute-force distance cross join: the engine's deletion-blocked
    // candidates + exact verify must recover the identical pair set
    "fuzzy_jw_topk" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
        |  FROM part WHERE p_size <= 10)
        |SELECT l.p_partkey AS key_a, r.p_partkey AS key_b,
        |       round(jaro_winkler_similarity(l.p_name, r.p_name), 6)
        |         AS sim
        |FROM p l JOIN p r
        |  ON l.blk = r.blk AND l.p_partkey < r.p_partkey
        |ORDER BY sim DESC, key_a ASC, key_b ASC
        |LIMIT 25""".stripMargin,
    "fuzzy_edit1_join" ->
      """SELECT a.s_name AS name_a, b.s_name AS name_b
        |FROM supplier a JOIN supplier b ON a.s_name < b.s_name
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    "g3_triangle_count" ->
      """WITH pairs AS (
        |  SELECT src, event_type AS dst FROM (
        |    SELECT event_type,
        |           lag(event_type) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) AS src
        |    FROM events)
        |  WHERE src IS NOT NULL AND src <> event_type),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM pairs),
        |tri AS (SELECT e1.a AS p, e1.b AS q, e2.b AS r
        |        FROM und e1
        |        JOIN und e2 ON e2.a = e1.b
        |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT p AS node FROM tri
        |            UNION ALL SELECT q FROM tri
        |            UNION ALL SELECT r FROM tri),
        |nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und)
        |SELECT n.node, coalesce(c.n_tri, 0) AS n_tri
        |FROM nodes n
        |LEFT JOIN (SELECT node, count(*) AS n_tri FROM corners
        |           GROUP BY node) c ON c.node = n.node
        |ORDER BY n.node""".stripMargin,
    "dedup_cc_clusters" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |         FROM documents),
        |paras0 AS (
        |  SELECT doc_id, t,
        |         unnest(range(1, CAST(ceil(len(t) / 10.0) AS BIGINT) + 1))
        |           AS pidx
        |  FROM toks),
        |paras AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(t[(pidx-1)*10+1 : (pidx-1)*10+10], ' ')
        |           AS para
        |  FROM paras0),
        |pf AS (SELECT para, count(*) AS df FROM paras GROUP BY para),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        |  FROM paras a JOIN paras b USING(para) JOIN pf USING(para)
        |  WHERE a.doc_id < b.doc_id AND pf.df BETWEEN 2 AND 10),
        |und AS MATERIALIZED (
        |  SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM und),
        |reach(node, lbl) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.node),
        |comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id
        |         FROM reach GROUP BY node),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size
        |          FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id, c.cluster_id, s.cluster_size,
        |       c.doc_id = c.cluster_id AS is_canonical
        |FROM comp c JOIN sizes s USING(cluster_id)""".stripMargin,
    "ev_ohlc" ->
      """WITH w AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         event_type, value,
        |         row_number() OVER (
        |           PARTITION BY date_trunc('day', ts), event_type
        |           ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (
        |           PARTITION BY date_trunc('day', ts), event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT day, event_type,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS n_events
        |FROM w GROUP BY day, event_type""".stripMargin,
    "j11_lateral_topn" ->
      """SELECT r.r_name, t.n_name, t.n_custs
        |FROM region r
        |JOIN LATERAL (
        |  SELECT n.n_name, count(*) AS n_custs
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_custs DESC, n.n_name ASC
        |  LIMIT 2) t ON TRUE""".stripMargin,
    "ev_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_date,
        |         count(*) AS freq,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS money
        |  FROM orders GROUP BY o_custkey),
        |anch AS (SELECT max(last_date) AS anchor FROM cust),
        |a2 AS (SELECT c.*, datediff('day', last_date, anchor) AS rec
        |       FROM cust c CROSS JOIN anch),
        |th AS (SELECT quantile_cont(rec,  [0.25, 0.5, 0.75]) AS rq,
        |              quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq,
        |              quantile_cont(money, [0.25, 0.5, 0.75]) AS mq
        |       FROM a2)
        |SELECT CAST(1 + (rec > rq[1])::INT + (rec > rq[2])::INT
        |              + (rec > rq[3])::INT AS INTEGER) AS r_seg,
        |       CAST(1 + (freq > fq[1])::INT + (freq > fq[2])::INT
        |              + (freq > fq[3])::INT AS INTEGER) AS f_seg,
        |       CAST(1 + (money > mq[1])::INT + (money > mq[2])::INT
        |              + (money > mq[3])::INT AS INTEGER) AS m_seg,
        |       count(*) AS n_customers, min(o_custkey) AS min_cust
        |FROM a2 CROSS JOIN th
        |GROUP BY 1, 2, 3""".stripMargin,
    "ivm_merge_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |             / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "emb_covariance" ->
      """WITH x AS (
        |  SELECT vec_id,
        |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER)
        |           AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT a.i AS i, b.i AS j,
        |       round(covar_samp(a.v, b.v), 6) + 0.0 AS cov
        |FROM x a JOIN x b USING (vec_id)
        |GROUP BY a.i, b.i""".stripMargin,
    "s11_zstd_roundtrip" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price,
         |       MAX(l_shipdate) AS max_shipdate
         |FROM lineitem""".stripMargin,
    "stream_session_parity" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE user_id < 60)
        |SELECT CAST(1 AS BOOLEAN) AS session_parity,
        |       CAST(SUM(CASE WHEN prev_us IS NULL
        |                       OR us - prev_us > 600000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x""".stripMargin,
    "w9_rank_suite" ->
      """WITH a AS (SELECT o_orderpriority, o_orderdate,
        |                  count(*) AS n_orders
        |           FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, o_orderdate, n_orders,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |       CAST(sum(n_orders) OVER (w ROWS UNBOUNDED PRECEDING)
        |            - n_orders + 1 AS BIGINT) AS rnk
        |FROM a
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_orderdate)""".stripMargin,
    "x18_try_suite" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |       COUNT(CASE WHEN o_custkey % 3 <> 0 THEN 1 END) AS n_div_ok,
        |       CAST(SUM(CASE WHEN o_custkey % 3 <> 0
        |                     THEN CAST(o_totalprice / (o_custkey % 3)
        |                               AS DECIMAL(18,4)) END)
        |            AS DOUBLE) AS sum_dv,
        |       COUNT(CASE WHEN o_orderkey <= 0 THEN 1 END) AS n_ov_ok,
        |       COUNT(TRY_CAST(o_orderpriority AS INTEGER)) AS n_badp_ok,
        |       CAST(SUM(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER))
        |            AS BIGINT) AS sum_prio
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "mm_ahash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'jpeg' ELSE 'png' END AS fmt,
        |         16 + doc_id % 48 AS w,
        |         16 + (doc_id * 7) % 32 AS h
        |  FROM documents),
        |pts AS (
        |  SELECT doc_id, j * 8 + i AS k,
        |         (doc_id * 31 + (i*w//8) * 7 + (j*h//8) * 13) % 256
        |       + (doc_id * 17 + (i*w//8) * 3 + (j*h//8) * 29) % 256
        |       + (doc_id * 11 + (i*w//8) * 23 + (j*h//8) * 5) % 256 AS lum
        |  FROM d, range(8) ti(i), range(8) tj(j)
        |  WHERE fmt = 'png'),
        |tot AS (SELECT doc_id, SUM(lum) AS total FROM pts GROUP BY doc_id),
        |hx AS (
        |  SELECT p.doc_id,
        |         CAST(SUM(CASE WHEN k >= 32 AND p.lum * 64 > t.total
        |                       THEN 1::BIGINT << (k - 32) ELSE 0 END)
        |              AS BIGINT) AS ahash_hi,
        |         CAST(SUM(CASE WHEN k < 32 AND p.lum * 64 > t.total
        |                       THEN 1::BIGINT << k ELSE 0 END)
        |              AS BIGINT) AS ahash_lo
        |  FROM pts p JOIN tot t USING (doc_id) GROUP BY p.doc_id),
        |grp AS (SELECT ahash_hi, ahash_lo, COUNT(*) AS n_same
        |        FROM hx GROUP BY 1, 2)
        |SELECT d.doc_id, d.fmt, hx.ahash_hi, hx.ahash_lo, g.n_same
        |FROM d
        |LEFT JOIN hx USING (doc_id)
        |LEFT JOIN grp g ON g.ahash_hi = hx.ahash_hi
        |              AND g.ahash_lo = hx.ahash_lo""".stripMargin,
    "q23_yoy_growth" ->
      """WITH yearly AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1, 2)
        |SELECT c.c_mktsegment, a.yr AS year_from,
        |       COUNT(*) AS n_base,
        |       COUNT(b.spend) AS n_retained,
        |       COUNT(CASE WHEN b.spend * 4 > a.spend * 5 THEN 1 END)
        |         AS n_grown
        |FROM yearly a
        |LEFT JOIN yearly b
        |  ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
        |JOIN customer c ON c.c_custkey = a.o_custkey
        |GROUP BY 1, 2""".stripMargin,
    // TPC-DS Q47/Q57 shape: lag/lead + within-year avg windows over a
    // multi-join monthly agg; deviation predicate is integer-scaled
    // DECIMAL so no double rounding can disagree between engines
    // brute-force all-pairs cosine referee for the prefix-filtered
    // engine join: same tf·ln(N/df) weights, full token self-join
    "fuzzy_cosine_join" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
        |       FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |w AS (SELECT tf.doc_id, tf.token, tf * ln(n_docs / df) AS w
        |      FROM tf JOIN df USING (token) CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nm FROM w GROUP BY 1),
        |wn AS (SELECT w.doc_id, token, w / nm AS wn
        |       FROM w JOIN nrm USING (doc_id) WHERE nm > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       round(SUM(a.wn * b.wn), 6) AS sim
        |FROM wn a JOIN wn b
        |  ON a.token = b.token AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING round(SUM(a.wn * b.wn), 6) >= 0.9""".stripMargin,
    // same TF-IDF cosine referee over the deterministically reshaped
    // Zipfian corpus (stopword/group/unique token spectrum) — this
    // variant's cost estimate takes the PREFIX-FILTER physical path,
    // so both branches of the adaptive join carry a correctness row
    "fuzzy_cosine_zipf" -> zipfCosineOracle,
    "q47_moving_avg" ->
      s"""WITH monthly AS (
         |  SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS yr,
         |         CAST(month(l_shipdate) AS INTEGER) AS mon,
         |         SUM($decPrice * $decDisc) AS sum_sales
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY 1, 2, 3),
         |w AS (
         |  SELECT n_name, yr, mon, sum_sales,
         |    lag(sum_sales) OVER seq AS psum,
         |    lead(sum_sales) OVER seq AS nsum,
         |    SUM(sum_sales) OVER yrw AS yr_sum,
         |    COUNT(*) OVER yrw AS n_months
         |  FROM monthly
         |  WINDOW seq AS (PARTITION BY n_name ORDER BY yr, mon),
         |         yrw AS (PARTITION BY n_name, yr))
         |SELECT n_name, yr, mon,
         |  CAST(sum_sales AS DOUBLE) AS sum_sales,
         |  CAST(yr_sum AS DOUBLE) / n_months AS avg_monthly,
         |  CAST(psum AS DOUBLE) AS psum,
         |  CAST(nsum AS DOUBLE) AS nsum
         |FROM w
         |WHERE yr = 1998
         |  AND abs(sum_sales * n_months - yr_sum) * 10 > yr_sum""".stripMargin,
    // TPC-DS Q51 shape: per-channel cumulative sums, FULL OUTER aligned
    // on (nation, yr, mon), running-MAX forward fill over the union
    // axis (cumulative sums of non-negative amounts are non-decreasing)
    "q51_cumulative_align" ->
      s"""WITH book AS (
         |  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
         |         CAST(month(o_orderdate) AS INTEGER) AS mon,
         |         SUM($decTotal) AS booked
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2, 3),
         |bc AS (
         |  SELECT n_name, yr, mon, SUM(booked) OVER (
         |    PARTITION BY n_name ORDER BY yr, mon
         |    ROWS UNBOUNDED PRECEDING) AS b_cume FROM book),
         |ship AS (
         |  SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS yr,
         |         CAST(month(l_shipdate) AS INTEGER) AS mon,
         |         SUM($decPrice * $decDisc) AS shipped
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT n_name, yr, mon, SUM(shipped) OVER (
         |    PARTITION BY n_name ORDER BY yr, mon
         |    ROWS UNBOUNDED PRECEDING) AS s_cume FROM ship),
         |j AS (
         |  SELECT coalesce(bc.n_name, sc.n_name) AS n_name,
         |         coalesce(bc.yr, sc.yr) AS yr,
         |         coalesce(bc.mon, sc.mon) AS mon,
         |         b_cume, s_cume
         |  FROM bc FULL OUTER JOIN sc
         |    ON bc.n_name = sc.n_name AND bc.yr = sc.yr AND bc.mon = sc.mon),
         |f AS (
         |  SELECT n_name, yr, mon,
         |    MAX(b_cume) OVER a AS book_cum,
         |    MAX(s_cume) OVER a AS ship_cum
         |  FROM j
         |  WINDOW a AS (PARTITION BY n_name ORDER BY yr, mon
         |               ROWS UNBOUNDED PRECEDING))
         |SELECT n_name, yr, mon,
         |  CAST(book_cum AS DOUBLE) AS book_cum,
         |  CAST(ship_cum AS DOUBLE) AS ship_cum
         |FROM f WHERE book_cum > ship_cum""".stripMargin,
    // TPC-DS Q67 shape: rollup grains ranked together within each
    // priority; fully tie-broken on non-null keys so NULLS FIRST/LAST
    // defaults never engage
    "q67_rollup_topk" ->
      """WITH base AS (
        |  SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(month(o_orderdate) AS INTEGER) AS mon, o_totalprice
        |  FROM orders),
        |rolled AS (
        |  SELECT o_orderpriority, yr, mon,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec,
        |         CAST(GROUPING(yr) AS INT) AS g_y,
        |         CAST(GROUPING(mon) AS INT) AS g_m
        |  FROM base GROUP BY ROLLUP(o_orderpriority, yr, mon)),
        |r AS (
        |  SELECT *, rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY spend_dec DESC, g_y, g_m,
        |             coalesce(yr, -1), coalesce(mon, -1)) AS rnk
        |  FROM rolled)
        |SELECT o_orderpriority, yr, mon, g_y, g_m,
        |       CAST(spend_dec AS DOUBLE) AS spend, CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 5""".stripMargin,
    // in-engine sketch gate (DuckDB's HLL is a different sketch): the
    // booleans are the contract, n_days anchors the calendar
    "ev_sliding_distinct" ->
      """SELECT CAST(1 AS BOOLEAN) AS sliding_distinct_ok,
        |       (SELECT COUNT(DISTINCT CAST(ts AS DATE))
        |        FROM events) AS n_days""".stripMargin,
    "s12_csv_dialect" ->
      """WITH h AS (
        |  SELECT c_custkey,
        |         c_mktsegment || ',' || chr(10) || '"' || c_name || '"'
        |           AS hostile
        |  FROM customer)
        |SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(length(hostile)) AS BIGINT) AS sum_len,
        |       COUNT(CASE WHEN instr(hostile, chr(10)) > 0 THEN 1 END)
        |         AS n_newline,
        |       COUNT(CASE WHEN instr(hostile, '"') > 0 THEN 1 END)
        |         AS n_quote,
        |       CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
        |FROM h""".stripMargin,
    // repeated-substring dedup: 8-token sliding windows occurring >1
    // time corpus-wide, merged into maximal per-doc spans (window
    // islands); 1-based positions on both engines, dup_tokens = exact
    // union size of flagged positions
    "dedup_substring" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l
        |            FROM documents),
        |g AS (SELECT doc_id, i AS pos, CAST(len(l) AS INTEGER) AS n_tokens,
        |        list_aggregate(l[i:i+7], 'string_agg', ' ') AS gram
        |      FROM (SELECT doc_id, l,
        |              unnest(generate_series(1, len(l) - 7)) AS i FROM tk)),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
        |f AS (SELECT doc_id, pos, n_tokens FROM g
        |      WHERE gram IN (SELECT gram FROM dup)),
        |brk AS (SELECT doc_id, pos, n_tokens,
        |          CASE WHEN lag(pos) OVER w IS NULL
        |                 OR pos - lag(pos) OVER w >= 8 THEN 1 ELSE 0
        |          END AS brk
        |        FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |isl AS (SELECT doc_id, pos, n_tokens,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS UNBOUNDED PRECEDING) AS island
        |        FROM brk),
        |sp AS (SELECT doc_id, island, min(pos) AS p0, max(pos) AS p1,
        |         COUNT(*) AS ng, max(n_tokens) AS nt
        |       FROM isl GROUP BY doc_id, island)
        |SELECT doc_id,
        |  CAST(SUM(ng) AS BIGINT) AS n_dup_grams,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens,
        |  max(nt) AS n_tokens,
        |  CAST(SUM(p1 - p0 + 8) AS BIGINT) / max(nt) AS dup_ratio
        |FROM sp GROUP BY doc_id""".stripMargin,
    // hashed-feature linear quality model: md5 bucket -> deterministic
    // stand-in weight (bucket*37 % 97 - 48), mean-pooled, thresholded;
    // integer score sums so both engines agree bit-for-bit
    "text_quality_model" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(len(tk) AS INTEGER) AS n_tokens,
        |        CAST(list_sum(list_transform(tk, x ->
        |          (CAST(('0x' || substring(md5(x), 1, 4)) AS INTEGER)
        |             % 256 * 37) % 97 - 48)) AS BIGINT) AS score_sum
        |      FROM t)
        |SELECT doc_id, n_tokens, score_sum,
        |  score_sum / n_tokens AS mean_score,
        |  score_sum / n_tokens > 0 AS keep
        |FROM s""".stripMargin,
    // the shuffle-attach variant is result-identical to the Zipf row
    // by construction (only the attach's physical branch differs), so
    // it shares the oracle verbatim
    "fuzzy_cosine_shuffle" -> zipfCosineOracle,
  )

  /** Unrolled PageRank CTE chain mirroring EventOps.pageRank step for
    * step: same edge weights (bigint/bigint double division), same
    * IEEE op order (constants cast to DOUBLE), same uniform dangling
    * redistribution, same 12-decimal per-iteration quantization — so
    * the two float pipelines can never drift at the 6-decimal compare
    * surface. */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.node,
         |         round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
         |               + CAST(0.85 AS DOUBLE) *
         |                 (coalesce(c.m, CAST(0 AS DOUBLE)) + dg.dm / nn.n),
         |               12) AS pr
         |  FROM nodes n
         |  CROSS JOIN nn
         |  CROSS JOIN (SELECT coalesce(sum(pr), CAST(0 AS DOUBLE)) AS dm
         |              FROM r${i - 1}
         |              WHERE node NOT IN (SELECT src FROM edges)) dg
         |  LEFT JOIN (SELECT e.dst, sum(r.pr * e.w) AS m
         |             FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |             GROUP BY e.dst) c ON c.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT src, event_type AS dst, count(*) AS n FROM (
       |    SELECT event_type,
       |           lag(event_type) OVER (PARTITION BY user_id
       |                                 ORDER BY ts, event_id) AS src
       |    FROM events)
       |  WHERE src IS NOT NULL GROUP BY src, dst),
       |edges AS MATERIALIZED (SELECT src, dst,
       |                 n / (sum(n) OVER (PARTITION BY src)) AS w
       |          FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr
       |       FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, round(pr, 6) AS pr FROM r$iters""".stripMargin
  }

  /** One definition backing BOTH n-gram decontamination oracles: the
    * string-keyed engine path and the xxhash64-keyed scale path emit
    * the identical report, so they share this SQL verbatim. */
  private val deconNgramSql =
    """WITH tk AS (SELECT doc_id,
      |  CAST(('0x' || substring(md5(text), 1, 4)) AS INTEGER) % 100 AS b,
      |  string_split(text, ' ') AS l FROM documents),
      |g AS (SELECT DISTINCT doc_id, b,
      |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
      |      FROM (SELECT doc_id, b, l,
      |              unnest(generate_series(1, len(l) - 2)) AS i FROM tk)),
      |tr AS (SELECT doc_id AS train_doc, g FROM g WHERE b < 90),
      |te AS (SELECT doc_id AS test_doc, g FROM g WHERE b >= 95)
      |SELECT train_doc,
      |       COUNT(DISTINCT g) AS n_shared_ngrams,
      |       COUNT(DISTINCT test_doc) AS n_test_docs
      |FROM tr JOIN te USING (g) GROUP BY 1""".stripMargin

  /** Sequential-fold dot product / norms — same left-to-right double
    * summation order as Similarity.dot/norm, so values are bit-identical. */
  private val cosSql =
    """list_sum(list_transform(range(1, len(v)+1), i -> qv[i] * v[i])) /
      |         (sqrt(list_sum(list_transform(qv, x -> x*x))) *
      |          sqrt(list_sum(list_transform(v, x -> x*x))))""".stripMargin

  /** Shared 3-gram-shingle + Jaccard>=0.6 CTE block — the single
    * definition backing dedup_jaccard, dedup_minhash_lsh, and
    * dedup_corpus so the oracles can never drift apart. */
  private val shingleJaccardCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
      |                                     for i in range(1, len(t)-1)]) AS s
      |       FROM toks WHERE len(t) >= 3),
      |e AS (SELECT doc_id, len(s) AS n, unnest(s) AS sh FROM sh),
      |jac AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |  HAVING COUNT(*) / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) >= 0.6),""".stripMargin

  /** Exact word-3-gram-shingle Jaccard >= 0.6 pairs (mirrors
    * Dedup.shingled + ngramJaccard). */
  private val jaccardOracle =
    s"""WITH
       |$shingleJaccardCte
       |jp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         COUNT(*) / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) AS jaccard
       |  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT jp.doc_a, jp.doc_b, jp.jaccard
       |FROM jp JOIN jac ON jp.doc_a = jac.doc_a AND jp.doc_b = jac.doc_b""".stripMargin
}
