"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship point-in-time feature pipeline (as-of + LOCF + lag +
  rolling + sessionize) over the deterministic synthetic `pages` fixture
  (FIXTURES.md) sized for sf0.001, plus a sanity read of the sf0.001 events
  table through the same operator family.
- queries(): one entry per operator family from SURVEY.md §2 over the
  driver's parquet tables.
- oracle_sql(): DuckDB-equivalent SQL with IDENTICAL column names; money
  aggregates are computed in integer cents on both sides so values match
  bit-exactly. Non-SQL-expressible ops omit the oracle (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from audio_feature_extraction_ray.config import EngineConfig, FeatureConfig, PipelineConfig
    from audio_feature_extraction_ray.pipelines.features import feature_dataset
    from audio_feature_extraction_ray.testdata import materialize_fixture

    pages_dir, signals_path = materialize_fixture("/tmp/afe_fixtures/entry", 2_000, n_files=2)
    cfg = PipelineConfig(
        input_path=pages_dir,
        features=FeatureConfig(signals_path=signals_path),
        engine=EngineConfig(num_partitions=8),
    )
    return feature_dataset(cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    from audio_feature_extraction_ray.pipelines import (
        bpe,
        events,
        hive,
        io_formats,
        relational,
        search_dedup,
        spans,
        splits,
        text_analysis,
    )
    from audio_feature_extraction_ray.stages.ann import (
        embedding_kmeans as _embedding_kmeans,
    )
    from audio_feature_extraction_ray.stages.ann import (
        embedding_kmeans_step as _embedding_kmeans_step,
    )
    from audio_feature_extraction_ray.stages.ann import (
        embedding_pca as _embedding_pca,
    )
    from audio_feature_extraction_ray.stages.ann import (
        embedding_pca_moments as _embedding_pca_moments,
    )
    from audio_feature_extraction_ray.stages.ann import (
        embedding_semdedup as _embedding_semdedup,
    )
    from audio_feature_extraction_ray.stages.multimodal import (
        media_audio_features as _media_audio_features,
    )
    from audio_feature_extraction_ray.stages.multimodal import (
        media_image_features as _media_image_features,
    )
    from audio_feature_extraction_ray.stages.multimodal import (
        media_video_frames as _media_video_frames,
    )

    q: dict[str, Callable[[str], Any]] = {
        # split / augment family (SURVEY §2.1 S6, §2.2 M6)
        "docs_split_stats": splits.docs_split_stats,
        "docs_augment": splits.docs_augment,  # rows-only (seeded RNG)
        "docs_augment_hashdrop": splits.docs_augment_hashdrop,
        "docs_mask_spans": splits.docs_mask_spans,
        "docs_mixture_sample": splits.docs_mixture_sample,
        "docs_stratified_sample": splits.docs_stratified_sample,
        "docs_temperature_mix": splits.docs_temperature_mix,
        "docs_weighted_sample": splits.docs_weighted_sample,
        "docs_global_shuffle": splits.docs_global_shuffle,
        # text analysis over `documents` (SURVEY north-rule additions)
        "doc_token_stats": text_analysis.token_stats,
        "doc_fingerprint": text_analysis.fingerprint,
        "doc_quality": text_analysis.quality,
        "doc_quality_rank": text_analysis.quality_rank,
        "docs_pack_sequences": text_analysis.pack_sequences,
        "docs_pack_greedy_single": text_analysis.pack_greedy_single_stream,
        "docs_chunk_windows": text_analysis.chunk_documents,
        "docs_pack_greedy": text_analysis.pack_greedy_nosplit,  # rows-only (partition-local greedy)
        "doc_langid": text_analysis.langid_docs,
        "docs_langid_confusion": text_analysis.langid_confusion,
        "doc_bpe_tokens": text_analysis.bpe_token_count,
        "docs_quarantine_stats": text_analysis.quarantine_stats,
        "docs_distinct_tokens": text_analysis.distinct_tokens,
        "docs_bloom_novelty": text_analysis.bloom_token_novelty,  # rows-only (bloom FPR)
        "docs_bloom_novelty_exact": text_analysis.bloom_token_novelty_exact,
        "docs_length_quantile_hist": text_analysis.length_quantile_hist,
        "docs_hll_tokens": text_analysis.hll_distinct_tokens,  # rows-only (sketch)
        "docs_hll_by_lang": text_analysis.hll_distinct_tokens_by_lang,  # rows-only (sketch)
        "docs_hll_langs_exact": text_analysis.hll_distinct_langs_exact,
        "docs_bigram_topk": text_analysis.bigram_topk,
        "docs_bigram_pmi": text_analysis.bigram_pmi,
        "token_heavy_hitters": text_analysis.token_heavy_hitters,
        "doc_tfidf_top_terms": text_analysis.tfidf_top_terms,
        "token_postings": text_analysis.token_postings,
        "doc_repetition_stats": text_analysis.repetition_stats,
        "doc_token_entropy": text_analysis.token_entropy,
        "docs_length_histogram": text_analysis.length_histogram,
        "docs_column_profile": text_analysis.column_profile,
        "docs_dq_violations": text_analysis.dq_violations,
        "doc_unigram_logprob": text_analysis.unigram_logprob,
        "doc_bigram_logprob": text_analysis.bigram_logprob,
        "docs_dsir_weights": text_analysis.dsir_weights,
        "docs_ccnet_buckets": text_analysis.ccnet_buckets,
        "docs_gopher_rules": text_analysis.gopher_rules,
        "docs_lang_join": text_analysis.docs_lang_join,
        "lang_top_token": text_analysis.lang_top_token,
        "docs_pii_scrub": text_analysis.pii_scrub,
        # sub-document n-gram span family (exact-substring dedup granularity)
        "docs_dup_spans": spans.dup_spans,
        "docs_decontaminate": spans.decontaminate,
        "docs_scrub_spans": spans.scrub_spans,
        "docs_source_overlap": spans.source_overlap,
        # tokenizer training (rows-only: iterative global argmax; pinned
        # against a naive single-process BPE reference in pytest)
        "docs_bpe_merges": bpe.bpe_merges,
        "docs_bpe_encode": bpe.bpe_encode,  # rows-only (iterative merge learning)
        # dedup family
        "dedup_exact_docs": search_dedup.dedup_exact_docs,
        "dedup_incremental": search_dedup.dedup_incremental_docs,
        "dedup_keep_best": search_dedup.dedup_keep_best_docs,
        "corpus_curate_pack": search_dedup.curate_pack,
        "docs_first_per_key": search_dedup.docs_first_per_key,
        "jaccard_pairs_sample": search_dedup.jaccard_pairs_sample,
        "jaccard_join_docs": search_dedup.jaccard_join_docs,
        "near_dedup_keep": search_dedup.near_dedup_keep,
        "edit_distance_pairs": search_dedup.edit_distance_pairs_sample,
        "dup_clusters": search_dedup.dup_clusters,
        "dup_triangles": search_dedup.dup_triangles,
        "doc_pagerank": search_dedup.doc_pagerank,
        "minhash_lsh_docs": search_dedup.minhash_lsh_docs,  # rows-only
        "simhash_pairs_docs": search_dedup.simhash_pairs_docs,  # rows-only
        "doc_signatures": search_dedup.doc_signatures,  # rows-only
        # multimodal: REAL PCM-WAV decode + log-mel/scalar DSP (rows-only)
        "media_audio_features": _media_audio_features,
        "media_image_features": _media_image_features,
        "media_video_frames": _media_video_frames,
        # similarity search over `embeddings`
        "ann_bruteforce": search_dedup.ann_bruteforce,
        "ann_filtered": search_dedup.ann_filtered,
        "embedding_dups": search_dedup.embedding_dups,
        "ann_ivf": search_dedup.ann_ivf,  # rows-only (approximate)
        "ann_ivf_fullprobe": search_dedup.ann_ivf_fullprobe,  # == brute force
        "knn_join_exact": search_dedup.knn_join_exact,  # Dataset x Dataset
        "embedding_lsh_dups": search_dedup.embedding_lsh_dups,  # rows-only (LSH)
        "embedding_kmeans": _embedding_kmeans,  # rows-only (iterative)
        "embedding_kmeans_step": _embedding_kmeans_step,  # exact-integer twin
        "embedding_semdedup": _embedding_semdedup,  # rows-only (iterative k-means)
        "embedding_pca": _embedding_pca,  # rows-only (eigendecomposition)
        "embedding_pca_moments": _embedding_pca_moments,  # exact-integer twin
        "embedding_normalize": search_dedup.embedding_normalize,
        "embedding_dist_hist": search_dedup.embedding_dist_hist,
        "embedding_quantize": search_dedup.embedding_quantize,
        "embedding_centroids": search_dedup.embedding_centroids,
        # point-in-time feature family (SURVEY §2.3/2.5/2.9) over `events`
        "events_lag_lead": events.lag_lead,
        "events_sessionize": events.sessionize,
        "events_rolling": events.rolling,
        "events_rolling_median": events.rolling_median,
        "events_locf": events.locf,
        "events_asof_join": events.asof_join,
        "events_asof_two_table": events.asof_join_two_table,
        "events_asof_forward": events.asof_join_forward,
        "events_asof_tolerance": events.asof_join_tolerance,
        "events_interarrival": events.interarrival_stats,
        "events_feature_matrix": events.feature_matrix,
        "events_dedup_first": events.dedup_first,
        "events_window_agg": events.window_agg,
        "events_distinct_users": events.distinct_users,
        "events_quantiles": events.value_quantiles,
        "events_quantile_sketch": events.value_quantile_sketch,  # rows-only (sketch)
        "events_zscore": events.zscore,
        "events_robust_zscale": events.robust_zscale,
        "events_target_encode": events.target_encode,
        "events_value_bins": events.value_bins,
        "events_quantile_bins": events.quantile_bins,
        "events_user_rfm": events.user_rfm,
        "events_psi_drift": events.psi_drift,
        "events_hive_pruned": hive.hive_pruned_agg,
        "events_orc_roundtrip": io_formats.events_orc_roundtrip,
        "events_value_ecdf": events.value_ecdf,
        "events_cusum": events.cusum_stats,
        "events_benford_digits": events.benford_digits,
        "events_daily_last": events.daily_last,
        "events_feature_cross": events.feature_cross,
        "events_ab_srm": events.ab_srm,
        "events_interval_join": events.interval_join_signup,
        "events_unpivot": events.unpivot_user_type,
        "events_gap_buckets": events.gap_buckets,
        "events_jackknife_se": events.jackknife_se,
        "events_trend_slope": events.trend_slope,
        "events_churn_labels": events.churn_labels,
        "events_user_entropy": events.user_entropy,
        "events_autocorr1": events.autocorr1,
        "events_survival_counts": events.survival_counts,
        "events_activity_gini": events.activity_gini,
        "events_resample_interp": events.resample_interp,
        "events_time_features": events.time_features,
        "events_median_2pass": events.median_2pass,
        "token_topk_rescore": text_analysis.token_topk_rescore,
        "token_countmin": text_analysis.token_countmin,
        "events_window_distinct": events.window_distinct,
        "docs_source_cap": text_analysis.source_cap,
        "token_zipf_hist": text_analysis.token_zipf_hist,
        "token_zipf_slope": text_analysis.token_zipf_slope,
        "token_heaps_curve": text_analysis.token_heaps_curve,
        "token_cooc_window": text_analysis.token_cooc_window,
        "docs_vocab_ids": text_analysis.docs_vocab_ids,
        "docs_ks_sources": text_analysis.ks_sources,
        "docs_lang_source_mi": text_analysis.lang_source_mi,
        "docs_vocab_encode": text_analysis.vocab_encode,
        "docs_bm25_topk": text_analysis.docs_bm25_topk,
        "docs_boolean_search": text_analysis.docs_boolean_search,
        "docs_pareto_front": text_analysis.docs_pareto_front,
        "docs_phrase_search": text_analysis.docs_phrase_search,
        "events_winsorized": events.winsorized_stats,
        "events_decayed_sum": events.decayed_sum,
        "events_cumulative": events.cumulative,
        "events_props_stats": events.props_stats,
        "events_value_props_corr": events.value_props_corr,
        "events_ab_lift": events.ab_lift,
        "events_pivot": events.pivot_user_type,
        "events_rollup": events.rollup_type_day,
        "events_cube": events.cube_type_day,
        "events_signup_window": events.signup_window_agg,
        "events_session_funnel": events.session_funnel,
        "events_session_transitions": events.session_transitions,
        "events_session_stats": events.session_stats,
        "events_retention_cohorts": events.retention_cohorts,
        "events_hopping_window": events.hopping_window,
        "events_time_window_sum": events.time_window_sum,
        # relational family (SURVEY §2.1/2.2/2.5/2.6/2.7)
        "q1_pricing": relational.q1_pricing,
        "revenue_by_segment": relational.revenue_by_segment,
        "topk_parts": relational.topk_parts,
        "filter_project": relational.filter_project,
        "segment_stats": relational.segment_stats,
        "orders_customer_join": relational.orders_customer_join,
        "cust_orders_left": relational.cust_orders_left,
        "top_orders_per_cust": relational.top_orders_per_cust,
        "custs_with_big_orders": relational.custs_with_big_orders,
        "custs_without_orders": relational.custs_without_orders,
        "orders_percent_rank": relational.orders_percent_rank,
        "orders_ntile": relational.orders_ntile,
        "q3_shipping": relational.q3_shipping,
        "q5_local_volume": relational.q5_local_volume,
        "q10_returned_items": relational.q10_returned_items,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q14_promo_share": relational.q14_promo_share,
        "q15_top_supplier": relational.q15_top_supplier,
        "q18_big_orders": relational.q18_big_orders,
        "q13_order_distribution": relational.q13_order_distribution,
        "q22_above_avg_balance": relational.q22_above_avg_balance,
        "q17_small_qty_revenue": relational.q17_small_qty_revenue,
        "q9_profit_by_nation": relational.q9_profit_by_nation,
        "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
        "q16_supplier_part_counts": relational.q16_supplier_part_counts,
        "q8_market_share": relational.q8_market_share,
        "q12_priority_by_status": relational.q12_priority_by_status,
        "q4_order_priority": relational.q4_order_priority,
        "q7_nation_volume": relational.q7_nation_volume,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q11_important_parts": relational.q11_important_parts,
        "q20_share_suppliers": relational.q20_share_suppliers,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "cust_orders_full": relational.cust_orders_full,
        "orders_bloom_semi": relational.orders_bloom_semi,
        "part_affinity_pairs": relational.part_affinity_pairs,
    }
    return q


def oracle_sql() -> dict[str, str]:
    from audio_feature_extraction_ray.pipelines import (
        events,
        hive,
        io_formats,
        relational,
        search_dedup,
        spans,
        splits,
        text_analysis,
    )
    from audio_feature_extraction_ray.stages.ann import (
        EMBEDDING_KMEANS_STEP_SQL,
        EMBEDDING_PCA_MOMENTS_SQL,
    )

    return {
        "docs_split_stats": splits.DOCS_SPLIT_STATS_SQL,
        "docs_augment_hashdrop": splits.DOCS_AUGMENT_HASHDROP_SQL,
        "docs_mask_spans": splits.DOCS_MASK_SPANS_SQL,
        "docs_mixture_sample": splits.DOCS_MIXTURE_SAMPLE_SQL,
        "docs_stratified_sample": splits.DOCS_STRATIFIED_SAMPLE_SQL,
        "docs_temperature_mix": splits.DOCS_TEMPERATURE_MIX_SQL,
        "docs_weighted_sample": splits._weighted_sample_sql(),
        "docs_global_shuffle": splits.DOCS_GLOBAL_SHUFFLE_SQL,
        "doc_token_stats": text_analysis.TOKEN_STATS_SQL,
        "doc_fingerprint": text_analysis.FINGERPRINT_SQL,
        "doc_quality": text_analysis.QUALITY_SQL,
        "doc_quality_rank": text_analysis.QUALITY_RANK_SQL,
        "docs_pack_sequences": text_analysis.PACK_SEQUENCES_SQL,
        "docs_pack_greedy_single": text_analysis.PACK_GREEDY_SINGLE_SQL,
        "docs_chunk_windows": text_analysis.CHUNK_DOCUMENTS_SQL,
        "doc_langid": text_analysis.LANGID_SQL,
        "docs_langid_confusion": text_analysis.LANGID_CONFUSION_SQL,
        "doc_bpe_tokens": text_analysis.BPE_TOKEN_COUNT_SQL,
        "docs_quarantine_stats": text_analysis.QUARANTINE_STATS_SQL,
        "docs_distinct_tokens": text_analysis.DISTINCT_TOKENS_SQL,
        "docs_bigram_topk": text_analysis.BIGRAM_TOPK_SQL,
        "docs_bigram_pmi": text_analysis.BIGRAM_PMI_SQL,
        "token_heavy_hitters": text_analysis.TOKEN_HEAVY_HITTERS_SQL,
        "doc_tfidf_top_terms": text_analysis.TFIDF_TOP_TERMS_SQL,
        "token_postings": text_analysis.TOKEN_POSTINGS_SQL,
        "doc_repetition_stats": text_analysis.REPETITION_STATS_SQL,
        "doc_token_entropy": text_analysis.TOKEN_ENTROPY_SQL,
        "docs_length_histogram": text_analysis.LENGTH_HISTOGRAM_SQL,
        "docs_bloom_novelty_exact": text_analysis.BLOOM_NOVELTY_EXACT_SQL_T,
        "docs_hll_langs_exact": text_analysis.HLL_LANGS_EXACT_SQL,
        "docs_length_quantile_hist": text_analysis.LENGTH_QUANTILE_HIST_SQL,
        "docs_column_profile": text_analysis.COLUMN_PROFILE_SQL,
        "docs_dq_violations": text_analysis.DQ_VIOLATIONS_SQL,
        "doc_unigram_logprob": text_analysis.UNIGRAM_LOGPROB_SQL,
        "doc_bigram_logprob": text_analysis.BIGRAM_LOGPROB_SQL,
        "docs_dsir_weights": text_analysis.DSIR_WEIGHTS_SQL,
        "docs_ccnet_buckets": text_analysis.CCNET_BUCKETS_SQL,
        "docs_gopher_rules": text_analysis.GOPHER_RULES_SQL,
        "docs_pii_scrub": text_analysis.PII_SCRUB_SQL,
        "docs_lang_join": text_analysis.DOCS_LANG_JOIN_SQL,
        "lang_top_token": text_analysis.LANG_TOP_TOKEN_SQL,
        "docs_dup_spans": spans.DUP_SPANS_SQL,
        "docs_decontaminate": spans.DECONTAMINATE_SQL,
        "docs_scrub_spans": spans.SCRUB_SPANS_SQL,
        "docs_source_overlap": spans.SOURCE_OVERLAP_SQL,
        "dedup_exact_docs": search_dedup.DEDUP_EXACT_DOCS_SQL,
        "dedup_incremental": search_dedup.DEDUP_INCREMENTAL_DOCS_SQL,
        "dedup_keep_best": search_dedup._dedup_keep_best_sql(),
        "corpus_curate_pack": search_dedup._curate_pack_sql(),
        "docs_first_per_key": search_dedup.DOCS_FIRST_PER_KEY_SQL,
        "jaccard_pairs_sample": search_dedup.JACCARD_PAIRS_SQL,
        "jaccard_join_docs": search_dedup.JACCARD_JOIN_SQL,
        "near_dedup_keep": search_dedup.NEAR_DEDUP_KEEP_SQL,
        "edit_distance_pairs": search_dedup.EDIT_DISTANCE_PAIRS_SQL,
        "dup_clusters": search_dedup.DUP_CLUSTERS_SQL,
        "dup_triangles": search_dedup.DUP_TRIANGLES_SQL,
        "doc_pagerank": search_dedup.DOC_PAGERANK_SQL,
        "ann_bruteforce": search_dedup.ANN_BRUTEFORCE_SQL,
        "ann_filtered": search_dedup.ANN_FILTERED_SQL,
        "ann_ivf_fullprobe": search_dedup.ANN_BRUTEFORCE_SQL,  # full probe == exact
        "knn_join_exact": search_dedup.KNN_JOIN_EXACT_SQL,
        "embedding_normalize": search_dedup.EMBEDDING_NORMALIZE_SQL,
        "embedding_dist_hist": search_dedup.EMBEDDING_DIST_HIST_SQL,
        "embedding_quantize": search_dedup.EMBEDDING_QUANTIZE_SQL,
        "embedding_centroids": search_dedup.EMBEDDING_CENTROIDS_SQL,
        "embedding_dups": search_dedup.EMBEDDING_DUPS_SQL,
        "embedding_kmeans_step": EMBEDDING_KMEANS_STEP_SQL,
        "embedding_pca_moments": EMBEDDING_PCA_MOMENTS_SQL,
        "events_lag_lead": events.LAG_LEAD_SQL,
        "events_sessionize": events.SESSIONIZE_SQL,
        "events_rolling": events.ROLLING_SQL,
        "events_rolling_median": events.ROLLING_MEDIAN_SQL,
        "events_locf": events.LOCF_SQL,
        "events_asof_join": events.ASOF_JOIN_SQL,
        "events_asof_two_table": events.ASOF_TWO_TABLE_SQL,
        "events_asof_forward": events.ASOF_FORWARD_SQL,
        "events_asof_tolerance": events.ASOF_TOLERANCE_SQL,
        "events_interarrival": events.INTERARRIVAL_SQL,
        "events_feature_matrix": events.FEATURE_MATRIX_SQL,
        "events_dedup_first": events.DEDUP_FIRST_SQL,
        "events_window_agg": events.WINDOW_AGG_SQL,
        "events_distinct_users": events.DISTINCT_USERS_SQL,
        "events_quantiles": events.VALUE_QUANTILES_SQL,
        "events_zscore": events.ZSCORE_SQL,
        "events_robust_zscale": events.ROBUST_ZSCALE_SQL,
        "events_target_encode": events.TARGET_ENCODE_SQL,
        "events_value_bins": events.VALUE_BINS_SQL,
        "events_quantile_bins": events.QUANTILE_BINS_SQL,
        "events_user_rfm": events.USER_RFM_SQL,
        "events_psi_drift": events.PSI_DRIFT_SQL,
        "events_hive_pruned": hive.HIVE_PRUNED_SQL,
        "events_orc_roundtrip": io_formats.EVENTS_ORC_ROUNDTRIP_SQL,
        "events_value_ecdf": events.VALUE_ECDF_SQL,
        "events_cusum": events.CUSUM_SQL,
        "events_benford_digits": events.BENFORD_SQL,
        "events_daily_last": events.DAILY_LAST_SQL,
        "events_feature_cross": events.FEATURE_CROSS_SQL,
        "events_ab_srm": events.AB_SRM_SQL,
        "events_interval_join": events.INTERVAL_JOIN_SIGNUP_SQL,
        "events_unpivot": events.UNPIVOT_USER_TYPE_SQL,
        "events_gap_buckets": events.GAP_BUCKETS_SQL,
        "events_jackknife_se": events.JACKKNIFE_SE_SQL,
        "events_trend_slope": events.TREND_SLOPE_SQL,
        "events_churn_labels": events.CHURN_LABELS_SQL,
        "events_user_entropy": events.USER_ENTROPY_SQL,
        "events_autocorr1": events.AUTOCORR1_SQL,
        "events_survival_counts": events.SURVIVAL_COUNTS_SQL,
        "events_activity_gini": events.ACTIVITY_GINI_SQL,
        "events_resample_interp": events.RESAMPLE_INTERP_SQL,
        "events_time_features": events.TIME_FEATURES_SQL,
        "events_median_2pass": events.MEDIAN_2PASS_SQL,
        "token_topk_rescore": text_analysis.TOKEN_TOPK_RESCORE_SQL,
        "token_countmin": text_analysis.TOKEN_COUNTMIN_SQL,
        "events_window_distinct": events.WINDOW_DISTINCT_SQL,
        "docs_source_cap": text_analysis.SOURCE_CAP_SQL,
        "token_zipf_hist": text_analysis.TOKEN_ZIPF_HIST_SQL,
        "token_zipf_slope": text_analysis.TOKEN_ZIPF_SLOPE_SQL,
        "token_heaps_curve": text_analysis.TOKEN_HEAPS_CURVE_SQL,
        "token_cooc_window": text_analysis.TOKEN_COOC_WINDOW_SQL,
        "docs_vocab_ids": text_analysis.DOCS_VOCAB_IDS_SQL,
        "docs_ks_sources": text_analysis.KS_SOURCES_SQL,
        "docs_lang_source_mi": text_analysis.LANG_SOURCE_MI_SQL,
        "docs_vocab_encode": text_analysis.DOCS_VOCAB_ENCODE_SQL,
        "docs_bm25_topk": text_analysis.DOCS_BM25_SQL,
        "docs_boolean_search": text_analysis.DOCS_BOOLEAN_SQL,
        "docs_pareto_front": text_analysis.DOCS_PARETO_SQL,
        "docs_phrase_search": text_analysis.DOCS_PHRASE_SQL,
        "events_winsorized": events.WINSORIZED_STATS_SQL,
        "events_decayed_sum": events.DECAYED_SUM_SQL,
        "events_cumulative": events.CUMULATIVE_SQL,
        "events_props_stats": events.PROPS_STATS_SQL,
        "events_value_props_corr": events.VALUE_PROPS_CORR_SQL,
        "events_ab_lift": events.AB_LIFT_SQL,
        "events_pivot": events.PIVOT_USER_TYPE_SQL,
        "events_rollup": events.ROLLUP_TYPE_DAY_SQL,
        "events_cube": events.CUBE_TYPE_DAY_SQL,
        "events_signup_window": events.SIGNUP_WINDOW_AGG_SQL,
        "events_session_funnel": events.SESSION_FUNNEL_SQL,
        "events_session_transitions": events.SESSION_TRANSITIONS_SQL,
        "events_session_stats": events.SESSION_STATS_SQL,
        "events_retention_cohorts": events.RETENTION_COHORTS_SQL,
        "events_hopping_window": events.HOPPING_WINDOW_SQL,
        "events_time_window_sum": events.TIME_WINDOW_SUM_SQL,
        "q1_pricing": relational.Q1_SQL,
        "revenue_by_segment": relational.REVENUE_BY_SEGMENT_SQL,
        "topk_parts": relational.TOPK_PARTS_SQL,
        "filter_project": relational.FILTER_PROJECT_SQL,
        "segment_stats": relational.SEGMENT_STATS_SQL,
        "orders_customer_join": relational.ORDERS_CUSTOMER_JOIN_SQL,
        "cust_orders_left": relational.CUST_ORDERS_LEFT_SQL,
        "top_orders_per_cust": relational.TOP_ORDERS_PER_CUST_SQL,
        "custs_with_big_orders": relational.CUSTS_WITH_BIG_ORDERS_SQL,
        "custs_without_orders": relational.CUSTS_WITHOUT_ORDERS_SQL,
        "orders_percent_rank": relational.ORDERS_PERCENT_RANK_SQL,
        "orders_ntile": relational.ORDERS_NTILE_SQL,
        "q3_shipping": relational.Q3_SHIPPING_SQL,
        "q5_local_volume": relational.Q5_LOCAL_VOLUME_SQL,
        "q10_returned_items": relational.Q10_RETURNED_ITEMS_SQL,
        "q6_forecast_revenue": relational.Q6_FORECAST_SQL,
        "q14_promo_share": relational.Q14_PROMO_SHARE_SQL,
        "q15_top_supplier": relational.Q15_TOP_SUPPLIER_SQL,
        "q18_big_orders": relational.Q18_BIG_ORDERS_SQL,
        "q13_order_distribution": relational.Q13_ORDER_DISTRIBUTION_SQL,
        "q22_above_avg_balance": relational.Q22_ABOVE_AVG_SQL,
        "q17_small_qty_revenue": relational.Q17_SMALL_QTY_SQL,
        "q9_profit_by_nation": relational.Q9_PROFIT_SQL,
        "q19_disjunctive_revenue": relational.Q19_DISJUNCTIVE_SQL,
        "q16_supplier_part_counts": relational.Q16_SUPPLIER_PART_SQL,
        "q8_market_share": relational.Q8_MARKET_SHARE_SQL,
        "q12_priority_by_status": relational.Q12_PRIORITY_SQL,
        "q4_order_priority": relational.Q4_ORDER_PRIORITY_SQL,
        "q7_nation_volume": relational.Q7_NATION_VOLUME_SQL,
        "q2_min_cost_supplier": relational.Q2_MIN_COST_SQL,
        "q11_important_parts": relational.Q11_IMPORTANT_SQL,
        "q20_share_suppliers": relational.Q20_SHARE_SQL,
        "q21_waiting_suppliers": relational.Q21_WAITING_SQL,
        "cust_orders_full": relational.CUST_ORDERS_FULL_SQL,
        "orders_bloom_semi": relational.ORDERS_BLOOM_SEMI_SQL,
        "part_affinity_pairs": relational.PART_AFFINITY_SQL,
    }
