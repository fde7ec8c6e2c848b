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
    events,
    graphops,
    joins_extra,
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
_MODULES = (corpusops, graphops, streaming, dedup, similarity, multimodal, textops,
            scaleops, warehouse, pipelineops, events, joins_extra,
            tpch_extra, relational_extra, relational)

# The 50 queries pinned to the FRONT of the driver's correctness window
# (the driver records only the first 50 queries() entries). Round-6
# selection rule (VERDICT.md r4 asks #1/#2/#5, r5 ask #2):
#   1. RED-UNTIL-GREEN — any query whose LAST driver row was
#      hash_match:false keeps its slot until a driver row says green
#      (kafka_wire_roundtrip + snapshot_diff_cdc, both reworked this
#      round to bigint-cents/string outputs).
#   2. Reworked or new this round — must be (re-)verified.
#   3. Never driver-checked (9 oracles had no row in r1-r5).
#   4. Oldest driver row first (r1, then r2) — everything else in the
#      r5 window has an r3/r4/r5 green row and rotates out.
# Module order above ranks everything not listed.
_WINDOW_PRIORITY = (
    # -- 1. red in their last driver row (r4/r5; reworked this round) --
    "kafka_wire_roundtrip", "snapshot_diff_cdc",
    # -- 2. new in round 6 ------------------------------------------
    "metadata_compiled_q3", "metadata_corpus_refinery",
    "winnow_fingerprints", "winnow_overlap",
    "mixture_temperature_weights", "embedding_dup_clusters",
    "longest_shared_spans", "approx_price_quantiles",
    "python_datasource_pushdown", "sql_api_scripting",
    "sql_api_pipe_syntax", "pandas_api_status_profile", "bm25_topk",
    "ngram_jaccard_md5_pairs", "streaming_stream_stream_full_join",
    "streaming_session_window_dynamic", "sql_registered_pandas_udf",
    "pandas_udaf_cents",
    "span_dedup_removal", "vocab_coverage_curve", "bpe_merge_candidates",
    "unigram_entropy_scores", "inverted_index_postings",
    "events_gap_fill", "prefix_edit_near_dups", "ann_recall_report",
    "join_key_skew_histogram", "events_rolling_median",
    "zipf_fit_by_source", "events_anomaly_mad", "source_overlap_matrix",
    "minhash_estimate_error", "bpe_merge_apply", "cdc_chunking",
    "streaming_window_median", "collated_type_counts",
    "region_nation_listagg",
    # -- 3. never driver-checked ------------------------------------
    "q21_sole_late_suppliers", "q20_heavy_promo_suppliers",
    "q16_part_supplier_variety", "q11_top_balance_nations",
    "q9_promo_profit", "q8_nation_market_share", "q2_min_cost_supplier",
    "events_hourly_range_sum", "asof_cogroup_pandas",
    # -- 4. displaced from the r5 window (r1/r2-green era) ----------
    "q1_pricing_summary", "pipeline_add_fields",
)

# ROUND-7 WINDOW PLAN: the r2-era tail rolled out of the r6 window by
# round-6 additions (new queries displace the deepest slot-4 names
# into this list as they land), then the r5-window cohort (greens
# whose rows will be 2 rounds old by r7). Reds, as always, jump the
# queue.
_R7_EARMARK = (
    # round-6-new queries that no longer fit the 50-slot window (the
    # two core anchors q1/pipeline_add_fields are kept instead), then
    # r2-era greens displaced by the round-6 corpusops additions, plus
    # the two new rows-only ops (driver rows still pending for all)
    "ansi_safe_arithmetic", "order_status_mode", "null_safe_join_counts",
    "mv_join_delta_maintenance", "user_value_ewma",
    "events_cumulative_reach", "orders_yoy_growth",
    "matryoshka_truncation_audit", "event_path_topk",
    "knn_classifier_eval", "cluster_balanced_sample", "corpus_datacard",
    "sketch_family_pr_eval", "integrity_audit", "benford_price_audit",
    "bot_rate_flags", "events_drift_psi", "revenue_percent_of_parent",
    "customer_rfm_segments", "embedding_dim_variance",
    # (every name above this line is round-6-new and both-SF green
    # locally; they take r7 window slots 3+ after the usual reds/news)
    "q5_revenue_by_nation", "q3_shipping_priority", "q6_forecast_revenue",
    "latest3_orders_per_customer", "customer_running_total",
    "rollup_lineitem_flags",
    "customers_with_urgent_orders", "top10_customers_by_revenue",
    "cube_order_status_priority", "approx_distinct_customers",
    "asof_last_click_before_purchase", "customer_first_last_orders",
    "customer_status_profile", "events_json_extract", "events_range_join",
    "events_running_value", "events_sessionize", "events_sliding_window",
    "events_tumbling_window", "misra_gries_topk",
    "embedding_principal_component",
    "except_all_nation_bags", "full_outer_nation_roles",
    "grouping_sets_revenue", "intersect_all_order_counts",
    "lineitem_moment_stats", "nations_supplier_outer",
    "order_price_histogram", "order_price_quantiles", "orders_date_functions",
    "orders_window_analytics", "part_type_taxonomy",
    "pivot_status_by_priority",
    "q10_returned_revenue_topk", "q13_order_count_distribution",
    "q14_promo_revenue_pct", "q15_top_suppliers",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_disjunctive_predicate", "q22_idle_rich_customers",
    "q4_late_shipment_orders", "q7_nation_trade_volume",
    "unpivot_part_measures",
)


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
