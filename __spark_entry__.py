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
    dedup,
    events,
    joins_extra,
    multimodal,
    pipelineops,
    relational,
    relational_extra,
    scaleops,
    similarity,
    textops,
    tpch_extra,
)
from spark_kafka_airflow_pipeline_spark.streaming import pipelines as streaming  # noqa: E402

# Ordered newest/least-stable FIRST: the driver's CORRECTNESS file holds
# the first 50 queries() entries, so the modules whose internals changed
# most recently must land inside that window; the relational family has
# been driver-green since round 1-2 and sits at the tail (VERDICT.md r2,
# "What's wrong #1").
_MODULES = (streaming, dedup, similarity, multimodal, textops, scaleops,
            pipelineops, events, joins_extra, tpch_extra, relational_extra,
            relational)

# Queries pulled to the FRONT of the 50-entry driver window regardless
# of module order: everything added or internally reworked this round
# (new ops; the four streaming queries that failed on NTZ timestamps in
# r3; every consumer of the rebuilt shingle/char-ngram expressions).
# Module order above ranks the remainder.
_WINDOW_PRIORITY = (
    "streaming_tumbling_window", "streaming_sliding_window",
    "streaming_dedup_within_watermark", "streaming_session_window",
    "streaming_stream_stream_join",
    "dedup_keep_best", "hll_distinct_rollup", "multimodal_header_parse",
    "events_variant_extract", "doc_word_runs_udtf", "dpp_partitioned_join",
    "bitmap_distinct_rollup", "pq_ann_topk", "kafka_wire_roundtrip", "recursive_month_spine",
    "minhash_lsh_pairs", "ngram_jaccard_dups", "simhash_buckets",
    "simhash_near_dups", "dedup_clusters", "incremental_dedup_minhash",
    "doc_repetition_scores", "decontamination_ngram_overlap",
    "cross_doc_span_dups", "corpus_prep_pipeline",
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
