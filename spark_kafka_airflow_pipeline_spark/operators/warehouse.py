"""Warehouse-maintenance operators [EXT]: SCD2 history build, MERGE-
style keyed upsert, and partial-aggregate rollup.

The reference is a metadata-driven ETL pipeline
(``PipelineProcessor.scala:13-166``: validate -> annotate -> split ->
sink); these are the table-maintenance operators the same pipeline
needs the day its sinks become *dimensions* and *rollups* rather than
append-only files. All three are pure DataFrame compositions — no
MERGE INTO DSL is required: upsert is a union + per-key argmax, SCD2 is
change-collapse + range windows, and rollup-merge is re-aggregation of
partials — which is exactly how they distribute at 100 TB (one shuffle
on the key each, no driver-side state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table
from spark_kafka_airflow_pipeline_spark.operators.relational import dsum, SQL_DSUM


# ----------------------------------------------------------------------
# SCD2: slowly-changing-dimension type-2 history from an event stream
# ----------------------------------------------------------------------

def scd2_user_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build: each user's ``tier`` attribute (their
    purchase value bucketed low/mid/high) changes over time; the
    operator emits one row per (user, consecutive-tier run) with
    ``valid_from`` / ``valid_to`` / ``is_current`` — the standard
    warehouse representation of attribute history.

    Pipeline: project change events -> drop consecutive duplicates
    (lag over the user timeline: a "change" that repeats the previous
    tier is no change) -> lead() closes each version's validity range.
    One shuffle on user_id; every window shares that partitioning, so
    the whole history build is a single exchange at any scale.
    """
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "ts",
                  F.when(F.col("value") < 100, "low")
                  .when(F.col("value") < 500, "mid")
                  .otherwise("high").alias("tier")))
    by_user = Window.partitionBy("user_id").orderBy("ts", "tier")
    changes = (ev.withColumn("prev_tier", F.lag("tier").over(by_user))
               .filter(F.col("prev_tier").isNull()
                       | (F.col("prev_tier") != F.col("tier"))))
    ranged = (changes
              .withColumn("valid_to", F.lead("ts").over(by_user))
              .select("user_id", "tier",
                      F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                      .alias("valid_from"),
                      F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss")
                      .alias("valid_to"),
                      F.col("valid_to").isNull().alias("is_current")))
    return ranged


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, ts,
         CASE WHEN value < 100 THEN 'low'
              WHEN value < 500 THEN 'mid'
              ELSE 'high' END AS tier
  FROM events WHERE event_type = 'purchase'
), flagged AS (
  SELECT user_id, ts, tier,
         lag(tier) OVER (PARTITION BY user_id ORDER BY ts, tier) AS prev_tier
  FROM ev
), changes AS (
  SELECT user_id, ts, tier FROM flagged
  WHERE prev_tier IS NULL OR prev_tier != tier
)
SELECT user_id, tier,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, tier),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, tier) IS NULL
         AS is_current
FROM changes
"""


# ----------------------------------------------------------------------
# MERGE-style upsert: base snapshot + change batch -> new snapshot
# ----------------------------------------------------------------------

def upsert_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE/upsert without a table format: the "base snapshot"
    is each user's state from the first 80% of event ids, the "change
    batch" is the remaining 20%; the merged snapshot keeps the LATEST
    row per user across both (matched -> update, unmatched -> insert).

    Implemented as union + per-key argmax (``max_by`` over the
    (ts, event_id) recency struct) — the shuffle-once formulation of
    MERGE INTO that Delta/Iceberg compile to when the batch is large;
    there is no per-row lookup, so it scales with data volume, not
    batch count. Output: per-user latest event_type/value + which side
    supplied it."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    cut = F.col("event_id") % 5 != 0          # ~80% base
    base = ev.filter(cut).withColumn("side", F.lit("base"))
    batch = ev.filter(~cut).withColumn("side", F.lit("batch"))
    merged = base.unionByName(batch)
    rec = F.struct(F.col("ts"), F.col("event_id"))
    return (merged.groupBy("user_id")
            .agg(F.max_by("event_type", rec).alias("last_type"),
                 F.round(F.max_by("value", rec), 6).alias("last_value"),
                 F.max_by("side", rec).alias("from_side"),
                 F.count(F.lit(1)).alias("n_versions")))


UPSERT_SQL = """
WITH merged AS (
  SELECT event_id, user_id, ts, event_type, value,
         CASE WHEN event_id % 5 != 0 THEN 'base' ELSE 'batch' END AS side
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_versions
  FROM merged
)
SELECT user_id, event_type AS last_type, round(value, 6) AS last_value,
       side AS from_side, n_versions
FROM ranked WHERE rn = 1
"""


# ----------------------------------------------------------------------
# partial-aggregate rollup: merge pre-aggregated partials, no rescan
# ----------------------------------------------------------------------

def partial_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact partial-aggregate maintenance: per-(source, lang) partials
    (count / token sum / min / max) are merged to per-lang totals by
    RE-AGGREGATING THE PARTIALS — the raw documents are scanned once to
    build the partials and never again, which is the contract that
    makes daily/partition pre-aggregation work at 100 TB (yesterday's
    partials never get rescanned; avg is re-derived from merged
    sum/count because avg itself does not merge).

    Oracle: the direct per-lang aggregation — partial merge must be
    lossless for sum/count/min/max."""
    from spark_kafka_airflow_pipeline_spark.functions import text as T

    d = table(spark, sf_dir, "documents")
    partials = (d.groupBy("source", "lang")
                .agg(F.count(F.lit(1)).alias("p_docs"),
                     F.sum(T.token_count("text")).alias("p_tokens"),
                     F.min("n_chars").alias("p_min_chars"),
                     F.max("n_chars").alias("p_max_chars")))
    return (partials.groupBy("lang")
            .agg(F.sum("p_docs").alias("n_docs"),
                 F.sum("p_tokens").alias("total_tokens"),
                 F.min("p_min_chars").alias("min_chars"),
                 F.max("p_max_chars").alias("max_chars"))
            .select("lang", "n_docs", "total_tokens", "min_chars",
                    "max_chars",
                    F.round(F.col("total_tokens")
                            / F.col("n_docs"), 6).alias("avg_tokens")))


PARTIAL_AGG_SQL = """
WITH toks AS (
  SELECT lang, n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       round(CAST(SUM(n_tokens) AS BIGINT) * 1.0 / COUNT(*), 6) AS avg_tokens
FROM toks GROUP BY lang
"""


QUERIES: dict[str, QueryFn] = {
    "scd2_user_tier_history": scd2_user_tier_history,
    "upsert_latest_events": upsert_latest_events,
    "partial_agg_rollup": partial_agg_rollup,
}

ORACLES: dict[str, str] = {
    "scd2_user_tier_history": SCD2_SQL,
    "upsert_latest_events": UPSERT_SQL,
    "partial_agg_rollup": PARTIAL_AGG_SQL,
}
