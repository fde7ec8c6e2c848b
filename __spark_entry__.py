"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (rows-only entries omit the oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_kafka_airflow_pipeline_spark.operators import (  # noqa: E402
    corpusops,
    dedup,
    evalops,
    events,
    graphops,
    joins_extra,
    lakeops,
    multimodal,
    pipelineops,
    relational,
    relational_extra,
    scaleops,
    similarity,
    textops,
    tpch_extra,
    warehouse,
)
from spark_kafka_airflow_pipeline_spark.streaming import pipelines as streaming  # noqa: E402

# Ordered newest/least-stable FIRST: the driver's CORRECTNESS file holds
# the first 50 queries() entries, so the modules whose internals changed
# most recently must land inside that window; the relational family has
# been driver-green since round 1-2 and sits at the tail (VERDICT.md r2,
# "What's wrong #1").
_MODULES = (evalops, lakeops, corpusops, graphops, streaming, dedup,
            similarity, multimodal, textops, scaleops, warehouse,
            pipelineops, events, joins_extra, tpch_extra, relational_extra,
            relational)

# The 50 queries pinned to the FRONT of the driver's correctness window
# (the driver records only the first 50 queries() entries). Round-9 is
# the ROTATION round the r8 verdict called for (breadth phase over):
#   1. The 39 never-driver-checked late-r8 queries (the r8 verdict's
#      #1 ask: run the window exactly per the r8 _R9_EARMARK; judge
#      pre-verified 13/39 green at sf0.01). Four of them were also
#      REWORKED this round per r8 ADVICE — source_js_divergence (pair
#      universe now seeded from the source cross join, disjoint pairs
#      emit ln(2)), daily_burstiness_fano + purchase_view_ccf
#      (moments widened to DECIMAL(38,0)/HUGEINT), blocking_quality_
#      report's banding now THE implementation md5_minhash_verified_
#      pairs consumes (single banding copy).
#   2. The oldest stale greens (r5-cohort rows, 4 rounds old) in the
#      remaining 11 slots.
# Refresh SLA: with 50 slots over ~330 queries, every oracled query's
# driver row must be refreshed within ~7 rounds; _R10_EARMARK below
# continues the rotation (r5-cohort tail, then r6/r7 cohorts).
# PINNED-ONCE exemptions (slots never re-burned on known `no_oracle`):
#   - embedding_principal_component (r7 rows-only row, spark_rows=64):
#     float-accumulation micro-digits have no DuckDB twin; correctness
#     is property-tested against numpy.linalg.eigh
#     (tests/test_corpusops.py).
#   - parquet_footer_stats (r8 rows-only row, per the r8 verdict's
#     ask #3): its oracle cannot be the fixed-SQL kind — the query
#     reads file-level footer metadata, and file paths can't
#     parameterize the driver's fixed oracle string; its semantics are
#     pinned against DuckDB parquet_metadata() in pytest
#     (tests/test_formats_and_approx.py), which is the real evidence.
#   - approx_distinct_customers (r5 rows-only row): HLL++ estimates
#     have no exact-SQL twin BY DESIGN; the 2x-rsd accuracy envelope
#     is asserted against the exact count at all three SFs in
#     tests/test_formats_and_approx.py::test_approx_distinct_within_rsd.
#     (It sat in the r8 _R9_EARMARK's stale-refresh tail; exempting it
#     frees the slot for an oracled name, per the same slot-waste
#     rationale as the two rows above.)
# Module order above ranks everything not listed.
_WINDOW_PRIORITY = (
    # -- 1. first driver rows for the late-r8 cohort (39) ------------
    "replication_checksum_audit", "winsorized_price_stats",
    "woe_iv_segment_priority", "score_auc_acctbal",
    "gini_lorenz_customers", "acf_daily_revenue", "kaplan_meier_reorder",
    "score_lift_gain_deciles", "score_calibration_bins",
    "source_js_divergence", "daily_burstiness_fano", "nation_revenue_hhi",
    "threshold_sweep_pr_f1", "segment_priority_mutual_info",
    "classifier_agreement_kappa", "isotonic_calibration_bins",
    "purchase_view_ccf",
    "compaction_bin_plan", "zorder_clustering_audit",
    "bloom_filter_fpr_planner", "feature_hashing_collision_audit",
    "label_propagation_communities", "l_diversity_audit",
    "streaming_drift_monitor", "attribution_position_based",
    "ndcg_retrieval_eval", "walk_forward_cv_splits",
    "laplace_noise_planner", "recursive_cte_reach_curve",
    "multimodal_shard_plan", "blocking_quality_report",
    "forecast_pinball_eval", "fellegi_sunter_weights",
    "partition_retention_plan", "interarrival_dispersion",
    "metadata_privacy_report", "path_conditional_entropy",
    "price_volume_mix_decomposition", "order_price_qq_drift",
    # -- 2. REWORKED late in r9 (semantics changed: the twin now
    #       mirrors production's signature-agreement pre-filter, both
    #       engines; reworks jump the queue) ------------------------
    "ngram_jaccard_md5_pairs",
    # -- 3. stale refresh: oldest r5-cohort greens (10) --------------
    "q5_revenue_by_nation", "q3_shipping_priority",
    "q6_forecast_revenue", "latest3_orders_per_customer",
    "customer_running_total", "rollup_lineitem_flags",
    "customers_with_urgent_orders", "top10_customers_by_revenue",
    "cube_order_status_priority", "asof_last_click_before_purchase",
)

# ROUND-10 WINDOW PLAN — the COMPLETE age-ordered rotation queue,
# GENERATED from the union of all CORRECTNESS_r*.json files (each
# name's LATEST driver round), not hand-curated: round-9-new queries
# first (their FIRST driver rows), then every non-window, non-exempt
# query ascending by its latest driver row (r2 -> r7 cohorts; the r9
# audit found the hand-written queue had silently skipped the
# r3/r4/r5-age cohorts — 102 queries — which this ordering restores).
# Reds and round-10 reworks, as always, jump the queue.
# (embedding_principal_component, parquet_footer_stats and
# approx_distinct_customers are EXEMPT — pinned-once rows-only rows,
# see _WINDOW_PRIORITY note.)
_R10_EARMARK = (
    # new in round 9, window already full — FIRST driver check in r10
    # (all locally sf0.001+sf0.01+sf0.1 green; plan-sweep clean)
    "association_rules_lift",
    "price_emd_drift",
    "orders_column_profile",
    "functional_dependency_audit",
    "mann_kendall_trend",
    "ab_power_planner",
    "nelson_aalen_hazard",
    "skew_salt_planner",
    # latest driver row round 2 (oldest cohorts first)
    "customer_first_last_orders",
    "customer_only_nations",
    "customer_status_profile",
    "events_json_extract",
    "events_range_join",
    "events_running_value",
    "events_sessionize",
    "events_sliding_window",
    "events_tumbling_window",
    "except_all_nation_bags",
    "full_outer_nation_roles",
    "grouping_sets_revenue",
    "intersect_all_order_counts",
    "lineitem_moment_stats",
    "nations_supplier_outer",
    "order_price_histogram",
    "order_price_quantiles",
    "orders_date_functions",
    "orders_window_analytics",
    "part_type_taxonomy",
    "pivot_status_by_priority",
    "q10_returned_revenue_topk",
    "q13_order_count_distribution",
    "q14_promo_revenue_pct",
    "q15_top_suppliers",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicate",
    "q22_idle_rich_customers",
    "q4_late_shipment_orders",
    "q7_nation_trade_volume",
    "unpivot_part_measures",
    # latest driver row round 3 (10 queries, oldest cohorts first)
    "bucketed_orders_lineitem_join",
    "doc_fingerprints",
    "doc_quality_scores",
    "incremental_dedup_exact",
    "lang_id_heuristic",
    "salted_group_agg",
    "source_mixture_plan",
    "training_shuffle_order",
    "validate_split_ko",
    "validate_split_ok",
    # latest driver row round 4 (45 queries, oldest cohorts first)
    "ann_lsh_topk",
    "bigram_logprob_scores",
    "bitmap_distinct_rollup",
    "cosine_topk",
    "decontamination_ngram_overlap",
    "dedup_clusters",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_keep_best",
    "doc_bpe_token_stats",
    "doc_chunks",
    "doc_repetition_scores",
    "doc_scrub",
    "doc_tfidf_topterms",
    "doc_token_stats",
    "doc_word_runs_udtf",
    "dpp_partitioned_join",
    "embedding_int8_quant_error",
    "embedding_near_dups",
    "embedding_norm_stats",
    "events_variant_extract",
    "hll_distinct_rollup",
    "incremental_dedup_minhash",
    "ivf_ann_topk",
    "kmeans_clusters",
    "label_centroid_similarity",
    "lang_quality_profile",
    "minhash_lsh_pairs",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_header_parse",
    "multimodal_resize",
    "ngram_jaccard_dups",
    "pq_ann_topk",
    "recursive_month_spine",
    "simhash_buckets",
    "simhash_near_dups",
    "stratified_sample",
    "streaming_dedup_keys",
    "streaming_sliding_window",
    "streaming_stateful_sessions",
    "streaming_static_join",
    "streaming_stream_stream_join",
    "streaming_tumbling_window",
    "word_freq_topk",
    # latest driver row round 5 (47 queries, oldest cohorts first)
    "ann_srp_topk",
    "asof_cogroup_arrow",
    "bloom_filter_join",
    "context_packing_manifest",
    "context_packing_stats",
    "corpus_prep_pipeline",
    "cross_doc_span_dups",
    "dedup_clusters_md5",
    "doc_dup_scores",
    "doc_source_arrow_stats",
    "event_transition_matrix",
    "events_drift_chi2",
    "events_funnel_conversion",
    "events_monthly_from_rollup",
    "events_retention_cohorts",
    "events_zscore_outliers",
    "gopher_quality_rules",
    "grouped_sample_topk",
    "hard_negative_mining",
    "incremental_dedup_md5",
    "lateral_topk_per_nation",
    "length_bucket_packing",
    "minhash_md5_pairs",
    "multimodal_arrow_features",
    "orders_status_transpose",
    "pagerank_supplier_rank",
    "partial_agg_rollup",
    "python_datasource_scan",
    "quality_percentile_filter",
    "scd2_user_tier_history",
    "simhash_md5_pairs",
    "split_leakage_audit",
    "sql_api_parameterized",
    "sql_api_revenue_rollup",
    "streaming_dedup_within_watermark",
    "streaming_python_source",
    "streaming_session_window",
    "streaming_stream_stream_left_join",
    "streaming_topk_per_window",
    "table_profile",
    "token_lift_pairs",
    "tokenizer_vocab_coverage",
    "triangle_count_suppliers",
    "upsert_latest_events",
    "value_trend_by_type",
    "weighted_mixture_sample",
    "zorder_layout",
    # latest driver row round 6 (45 queries, oldest cohorts first)
    "ann_recall_report",
    "asof_cogroup_pandas",
    "bm25_topk",
    "bpe_merge_apply",
    "bpe_merge_candidates",
    "cdc_chunking",
    "collated_type_counts",
    "embedding_dup_clusters",
    "events_anomaly_mad",
    "events_gap_fill",
    "events_hourly_range_sum",
    "events_rolling_median",
    "kafka_wire_roundtrip",
    "longest_shared_spans",
    "metadata_compiled_q3",
    "metadata_corpus_refinery",
    "minhash_estimate_error",
    "mixture_temperature_weights",
    "pandas_api_status_profile",
    "pandas_udaf_cents",
    "prefix_edit_near_dups",
    "python_datasource_pushdown",
    "q11_top_balance_nations",
    "q16_part_supplier_variety",
    "q20_heavy_promo_suppliers",
    "q21_sole_late_suppliers",
    "q2_min_cost_supplier",
    "q8_nation_market_share",
    "q9_promo_profit",
    "region_nation_listagg",
    "snapshot_diff_cdc",
    "source_overlap_matrix",
    "span_dedup_removal",
    "sql_api_pipe_syntax",
    "sql_api_scripting",
    "sql_registered_pandas_udf",
    "streaming_session_window_dynamic",
    "streaming_stream_stream_full_join",
    "streaming_window_median",
    "unigram_entropy_scores",
    "vocab_coverage_curve",
    "winnow_fingerprints",
    "winnow_overlap",
    "zipf_fit_by_source",
    # latest driver row round 7 (46 queries, oldest cohorts first)
    "ansi_safe_arithmetic",
    "approx_price_quantiles",
    "attribution_last_touch",
    "benford_price_audit",
    "bootstrap_mean_ci",
    "bot_rate_flags",
    "cluster_balanced_sample",
    "cms_heavy_hitters",
    "corpus_datacard",
    "cross_lang_fingerprint_spread",
    "customer_global_rank",
    "customer_pareto_abc",
    "customer_rfm_segments",
    "dau_wau_stickiness",
    "decayed_type_popularity",
    "embedding_dim_variance",
    "event_path_topk",
    "events_cumulative_reach",
    "events_drift_psi",
    "frequent_part_pairs",
    "integrity_audit",
    "inverted_index_postings",
    "join_key_skew_histogram",
    "kmv_distinct_rollup",
    "kmv_source_overlap",
    "knn_classifier_eval",
    "lsh_parameter_planner",
    "matryoshka_truncation_audit",
    "metadata_streaming_tumbling",
    "mv_join_delta_maintenance",
    "null_safe_join_counts",
    "order_fulfillment_backlog",
    "order_status_mode",
    "orders_equidepth_bins",
    "orders_seasonality_index",
    "orders_yoy_growth",
    "rendezvous_shard_plan",
    "revenue_percent_of_parent",
    "scd2_point_in_time_join",
    "sketch_family_pr_eval",
    "stratified_sample_neyman",
    "supplier_bfs_hops",
    "theil_sen_trend",
    "user_value_ewma",
    "value_drift_continuous",
    "weighted_sample_aes",
    # latest driver row round 8 (49 queries, oldest cohorts first)
    "ab_test_welch",
    "benchmark_decontamination",
    "boilerplate_line_share",
    "brand_price_size_regression",
    "cohort_ltv_curve",
    "containment_md5_pairs",
    "customers_without_urgent_orders",
    "cv_fold_balance",
    "event_cooccurrence_pmi",
    "events_cusum_changepoint",
    "flesch_reading_ease",
    "freshness_sla_audit",
    "funnel_time_to_convert",
    "golden_record_merge",
    "holt_forecast_monthly",
    "incremental_ivf_assign",
    "k_anonymity_audit",
    "link_prediction_jaccard",
    "metadata_streaming_session",
    "metadata_streaming_sliding",
    "metadata_streaming_upsert",
    "minmax_skipping_audit",
    "misra_gries_topk",
    "multimodal_phash",
    "nations_with_both_roles",
    "ngram_novelty_score",
    "observed_scan_metrics",
    "orders_peak_concurrency",
    "pareto_frontier_parts",
    "part_scalar_functions",
    "pipeline_add_fields",
    "q12_late_priority_counts",
    "q1_pricing_summary",
    "retention_triangle",
    "rrf_hybrid_retrieval",
    "seasonal_adjusted_anomalies",
    "segment_distinct_stats",
    "selfjoin_cardinality_planner",
    "sequence_gap_audit",
    "session_dwell_bounce",
    "sorted_neighborhood_pairs",
    "sparse_cosine_pairs",
    "sql_udf_order_tiers",
    "streaming_foreachbatch_upsert",
    "systematic_sample_every_k",
    "target_encode_loo",
    "unigram_lm_quality",
    "watermark_delay_planner",
    "weighted_median_price",
)

# Stable alias for the NEXT round's earmark, whatever its round number —
# the bookkeeping tests reference this name so the rotation never breaks
# them again (r9 lesson: the r8 test hard-coded _R9_EARMARK).
_NEXT_EARMARK = _R10_EARMARK


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation —
    lineitem x orders x customer x nation x region star join with
    broadcast dims, filter, group-agg (SURVEY.md §7)."""
    return relational.q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise RuntimeError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _WINDOW_PRIORITY if n not in merged]
    if missing:
        raise RuntimeError(f"_WINDOW_PRIORITY names unknown: {missing}")
    front = {n: merged[n] for n in _WINDOW_PRIORITY}
    front.update((n, q) for n, q in merged.items() if n not in front)
    return front


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query (rows-only ops —
    MinHash/SimHash dedup, LSH ANN, session windows — are omitted, per
    the driver contract)."""
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
