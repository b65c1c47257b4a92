package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, DomainQueries, ExtQueries, QualityQueries, ScaleQueries, TextPipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The distinct-sources highlights query is the reference's most
    * distinctive semantics (SURVEY §7.2) — per-publisher argmax over the
    * full five-table join tree. */
  def entry(spark: SparkSession): DataFrame =
    DomainQueries.q32DistinctSources(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (CoreQueries.q01ScanFilterProject _),
    "q02_groupby_agg" -> (CoreQueries.q02GroupByAgg _),
    "q03_join_agg" -> (CoreQueries.q03JoinAgg _),
    "q04_left_join" -> (CoreQueries.q04LeftJoin _),
    "q05_disjunctive_join" -> (CoreQueries.q05DisjunctiveJoin _),
    "q06_asof_day_join" -> (CoreQueries.q06AsOfDayJoin _),
    "q07_notin_anti_join" -> (CoreQueries.q07NotInAntiJoin _),
    "q08_argmax_struct_max" -> (CoreQueries.q08ArgmaxStructMax _),
    "q09_window_topn" -> (CoreQueries.q09WindowTopN _),
    "q10_topk_offset" -> (CoreQueries.q10TopKOffset _),
    "q11_json_extract" -> (CoreQueries.q11JsonExtract _),
    "q12_day_bucket_agg" -> (CoreQueries.q12DayBucketAgg _),
    "q13_coalesce_chain" -> (CoreQueries.q13CoalesceChain _),
    "q14_count_scalar" -> (CoreQueries.q14CountScalar _),
    "q15_union_discriminator" -> (CoreQueries.q15UnionDiscriminator _),
    "q16_distinct" -> (CoreQueries.q16Distinct _),
    "q17_isin_filter" -> (CoreQueries.q17IsInFilter _),
    "q18_scalar_functions" -> (CoreQueries.q18ScalarFunctions _),
    "q19_json_validity_gate" -> (CoreQueries.q19JsonValidityGate _),
    "q20_tumbling_day_window" -> (CoreQueries.q20TumblingDayWindow _),
    "q21_dedup_exact" -> (ExtQueries.q21DedupExact _),
    "q22_token_count" -> (ExtQueries.q22TokenCount _),
    "q23_text_quality" -> (ExtQueries.q23TextQuality _),
    "q24_lang_id" -> (ExtQueries.q24LangId _),
    "q25_ngram_jaccard_pairs" -> (ExtQueries.q25NgramJaccardPairs _),
    "q26_minhash_lsh" -> (ExtQueries.q26MinhashLsh _),
    "q27_simhash" -> (ExtQueries.q27Simhash _),
    "q28_cosine_topk" -> (ExtQueries.q28CosineTopK _),
    "q29_lsh_ann" -> (ExtQueries.q29LshAnn _),
    "q30_multimodal" -> (ExtQueries.q30Multimodal _),
    "q31_curated_highlights" -> (DomainQueries.q31CuratedHighlights _),
    "q32_distinct_sources" -> (DomainQueries.q32DistinctSources _),
    "q33_count_highlights" -> (DomainQueries.q33CountHighlights _),
    "q34_bucketed_ann" -> (ExtQueries.q34BucketedAnn _),
    "q35_embedding_neardup" -> (ExtQueries.q35EmbeddingNearDup _),
    "q36_ppm_decode" -> (ExtQueries.q36PpmDecode _),
    "q37_curation_pipeline" -> (ExtQueries.q37Curation _),
    "q38_ann_probe_stats" -> (ExtQueries.q38AnnProbeStats _),
    "q39_incremental_dedup" -> (ExtQueries.q39IncrementalDedup _),
    "q40_curation_stats" -> (ExtQueries.q40CurationStats _),
    "q41_quota_sample" -> (ExtQueries.q41QuotaSample _),
    "q42_asof_join" -> (ExtQueries.q42AsofJoin _),
    "q43_dedup_clusters" -> (ExtQueries.q43DedupClusters _),
    "q44_rotated_ann" -> (ExtQueries.q44RotatedAnn _),
    "q45_rate_mixture" -> (ExtQueries.q45RateMixture _),
    "q46_sessionize" -> (AnalyticsQueries.q46Sessionize _),
    "q47_interval_join" -> (AnalyticsQueries.q47IntervalJoin _),
    "q48_rollup_agg" -> (AnalyticsQueries.q48Rollup _),
    "q49_window_analytics" -> (AnalyticsQueries.q49WindowAnalytics _),
    "q50_daily_gapfill" -> (AnalyticsQueries.q50DailyGapfill _),
    "q51_tfidf_topterms" -> (TextPipelineQueries.q51TfidfTopTerms _),
    "q52_doc_chunking" -> (TextPipelineQueries.q52DocChunking _),
    "q53_hash_split" -> (TextPipelineQueries.q53HashSplit _),
    "q54_boilerplate" -> (TextPipelineQueries.q54Boilerplate _),
    "q55_exact_quantiles" -> (AnalyticsQueries.q55ExactQuantiles _),
    "q56_pii_scrub" -> (TextPipelineQueries.q56PiiScrub _),
    "q57_zorder_key" -> (AnalyticsQueries.q57ZorderKey _),
    "q58_approx_distinct" -> (AnalyticsQueries.q58ApproxDistinct _),
    "q59_incremental_agg" -> (AnalyticsQueries.q59IncrementalAgg _),
    "q60_global_index" -> (AnalyticsQueries.q60GlobalIndex _),
    "q61_pivot" -> (AnalyticsQueries.q61Pivot _),
    "q62_unpivot" -> (AnalyticsQueries.q62Unpivot _),
    "q63_hopping_window" -> (AnalyticsQueries.q63HoppingWindow _),
    "q64_ntile_deciles" -> (AnalyticsQueries.q64NtileDeciles _),
    "q65_funnel_asof" -> (AnalyticsQueries.q65Funnel _),
    "q66_contract_report" -> (QualityQueries.q66ContractReport _),
    "q67_fk_audit" -> (QualityQueries.q67FkAudit _),
    "q68_column_profile" -> (QualityQueries.q68ColumnProfile _),
    "q69_retention_cohorts" -> (QualityQueries.q69RetentionCohorts _),
    "q70_approx_quantiles" -> (QualityQueries.q70ApproxQuantiles _),
    "q71_shipping_priority" -> (QualityQueries.q71ShippingPriority _),
    "q72_grouping_sets" -> (QualityQueries.q72GroupingSets _),
    "q73_share_of_day" -> (QualityQueries.q73ShareOfDay _),
    "q74_label_centroids" -> (QualityQueries.q74LabelCentroids _),
    "q75_editdist_pairs" -> (QualityQueries.q75EditDistancePairs _),
    "q76_split_contamination" -> (ExtQueries.q76SplitContamination _),
    "q77_decontaminate" -> (ExtQueries.q77Decontaminate _),
    "q78_streaming_ingest_twin" -> (ExtQueries.q78StreamingIngestTwin _),
    "q79_audit_decontaminate" -> (ExtQueries.q79AuditDecontaminate _),
    "q80_repetition_stats" -> (QualityQueries.q80RepetitionStats _),
    "q81_bloom_join" -> (ScaleQueries.q81BloomJoin _),
    "q82_heavy_hitters" -> (ScaleQueries.q82HeavyHitters _),
    "q83_inverted_index" -> (ScaleQueries.q83InvertedIndex _),
    "q84_c4_clean" -> (ScaleQueries.q84C4Clean _),
    "q85_ivf_neardup" -> (ScaleQueries.q85IvfNearDup _),
    "q86_merge_upsert" -> (ScaleQueries.q86MergeUpsert _),
    "q87_shared_spans" -> (ScaleQueries.q87SharedSpans _),
    "q88_anomaly_days" -> (ScaleQueries.q88AnomalyDays _),
    "q89_trailing_active" -> (ScaleQueries.q89TrailingActive _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" -> CoreQueries.q01Sql,
    "q02_groupby_agg" -> CoreQueries.q02Sql,
    "q03_join_agg" -> CoreQueries.q03Sql,
    "q04_left_join" -> CoreQueries.q04Sql,
    "q05_disjunctive_join" -> CoreQueries.q05Sql,
    "q06_asof_day_join" -> CoreQueries.q06Sql,
    "q07_notin_anti_join" -> CoreQueries.q07Sql,
    "q08_argmax_struct_max" -> CoreQueries.q08Sql,
    "q09_window_topn" -> CoreQueries.q09Sql,
    "q10_topk_offset" -> CoreQueries.q10Sql,
    "q11_json_extract" -> CoreQueries.q11Sql,
    "q12_day_bucket_agg" -> CoreQueries.q12Sql,
    "q13_coalesce_chain" -> CoreQueries.q13Sql,
    "q14_count_scalar" -> CoreQueries.q14Sql,
    "q15_union_discriminator" -> CoreQueries.q15Sql,
    "q16_distinct" -> CoreQueries.q16Sql,
    "q17_isin_filter" -> CoreQueries.q17Sql,
    "q18_scalar_functions" -> CoreQueries.q18Sql,
    "q19_json_validity_gate" -> CoreQueries.q19Sql,
    "q20_tumbling_day_window" -> CoreQueries.q20Sql,
    "q21_dedup_exact" -> ExtQueries.q21Sql,
    "q22_token_count" -> ExtQueries.q22Sql,
    "q23_text_quality" -> ExtQueries.q23Sql,
    "q24_lang_id" -> ExtQueries.q24Sql,
    "q25_ngram_jaccard_pairs" -> ExtQueries.q25Sql,
    // q26/q27 oracle = brute-force Jaccard ≥ 0.5 (the hash-based candidate
    // stages are verified with exact Jaccard, so their OUTPUT is
    // engine-independent even though murmur3/xxhash64 aren't SQL-expressible)
    "q26_minhash_lsh" -> ExtQueries.q26Sql,
    "q27_simhash" -> ExtQueries.q27Sql,
    "q28_cosine_topk" -> ExtQueries.q28Sql,
    // q29/q34: axis-sign buckets are engine-reproducible, so the oracle
    // replicates the ANN pruning itself (q34 = same query, bucketed storage)
    "q29_lsh_ann" -> ExtQueries.q29Sql,
    "q34_bucketed_ann" -> ExtQueries.q29Sql,
    "q30_multimodal" -> ExtQueries.q30Sql,
    // q31-q33: the reference's REAL queries over DuckDB-reconstructible
    // domain fixtures (DomainQueries.fixtureCte) — the fidelity gate
    "q31_curated_highlights" -> DomainQueries.q31Sql,
    "q32_distinct_sources" -> DomainQueries.q32Sql,
    "q33_count_highlights" -> DomainQueries.q33Sql,
    "q35_embedding_neardup" -> ExtQueries.q35Sql,
    "q36_ppm_decode" -> ExtQueries.q36Sql,
    "q37_curation_pipeline" -> ExtQueries.q37Sql,
    // q38: the ANN probe METRICS themselves, oracle-recomputed
    "q38_ann_probe_stats" -> ExtQueries.q38Sql,
    // q39: incremental-ingest LSH vs brute-force cross-half Jaccard
    "q39_incremental_dedup" -> ExtQueries.q39Sql,
    // q40: the curation pipeline's per-stage drop counts, recomputed
    "q40_curation_stats" -> ExtQueries.q40Sql,
    // q41: the deterministic mixture itself (Knuth-scramble order)
    "q41_quota_sample" -> ExtQueries.q41Sql,
    // q42: as-of join vs DuckDB's native ASOF LEFT JOIN
    "q42_asof_join" -> ExtQueries.q42Sql,
    // q43: label-propagation components vs a recursive-CTE closure
    "q43_dedup_clusters" -> ExtQueries.q43Sql,
    // q44: seeded-rotation ANN vs the same literal matrix in SQL
    "q44_rotated_ann" -> ExtQueries.q44Sql,
    // q45: fractional/epoch mixture vs the same scramble decomposition
    "q45_rate_mixture" -> ExtQueries.q45Sql,
    // q46: batch sessionization vs DuckDB gaps-and-islands windows
    "q46_sessionize" -> AnalyticsQueries.q46Sql,
    // q47: bucketed interval join vs DuckDB's native IEJoin inequality join
    "q47_interval_join" -> AnalyticsQueries.q47Sql,
    "q48_rollup_agg" -> AnalyticsQueries.q48Sql,
    "q49_window_analytics" -> AnalyticsQueries.q49Sql,
    "q50_daily_gapfill" -> AnalyticsQueries.q50Sql,
    "q51_tfidf_topterms" -> TextPipelineQueries.q51Sql,
    "q52_doc_chunking" -> TextPipelineQueries.q52Sql,
    "q53_hash_split" -> TextPipelineQueries.q53Sql,
    "q54_boilerplate" -> TextPipelineQueries.q54Sql,
    "q55_exact_quantiles" -> AnalyticsQueries.q55Sql,
    "q56_pii_scrub" -> TextPipelineQueries.q56Sql,
    "q57_zorder_key" -> AnalyticsQueries.q57Sql,
    "q58_approx_distinct" -> AnalyticsQueries.q58Sql,
    "q59_incremental_agg" -> AnalyticsQueries.q59Sql,
    "q60_global_index" -> AnalyticsQueries.q60Sql,
    "q61_pivot" -> AnalyticsQueries.q61Sql,
    "q62_unpivot" -> AnalyticsQueries.q62Sql,
    "q63_hopping_window" -> AnalyticsQueries.q63Sql,
    "q64_ntile_deciles" -> AnalyticsQueries.q64Sql,
    "q65_funnel_asof" -> AnalyticsQueries.q65Sql,
    "q66_contract_report" -> QualityQueries.q66Sql,
    "q67_fk_audit" -> QualityQueries.q67Sql,
    "q68_column_profile" -> QualityQueries.q68Sql,
    "q69_retention_cohorts" -> QualityQueries.q69Sql,
    "q70_approx_quantiles" -> QualityQueries.q70Sql,
    "q71_shipping_priority" -> QualityQueries.q71Sql,
    "q72_grouping_sets" -> QualityQueries.q72Sql,
    "q73_share_of_day" -> QualityQueries.q73Sql,
    "q74_label_centroids" -> QualityQueries.q74Sql,
    "q75_editdist_pairs" -> QualityQueries.q75Sql,
    "q76_split_contamination" -> ExtQueries.q76Sql,
    "q77_decontaminate" -> ExtQueries.q77Sql,
    "q78_streaming_ingest_twin" -> ExtQueries.q78Sql,
    "q79_audit_decontaminate" -> ExtQueries.q79Sql,
    "q80_repetition_stats" -> QualityQueries.q80Sql,
    "q81_bloom_join" -> ScaleQueries.q81Sql,
    "q82_heavy_hitters" -> ScaleQueries.q82Sql,
    "q83_inverted_index" -> ScaleQueries.q83Sql,
    "q84_c4_clean" -> ScaleQueries.q84Sql,
    "q85_ivf_neardup" -> ScaleQueries.q85Sql,
    "q86_merge_upsert" -> ScaleQueries.q86Sql,
    "q87_shared_spans" -> ScaleQueries.q87Sql,
    "q88_anomaly_days" -> ScaleQueries.q88Sql,
    "q89_trailing_active" -> ScaleQueries.q89Sql
  )
}
