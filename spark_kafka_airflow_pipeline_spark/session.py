"""SparkSession factory tuned for both local testing and cluster scale.

The reference builds a bare session with zero configuration
(``PipelineApp.scala:16-19``). At 100 TB that is not enough, so the
engine pins a scale-aware posture:

- **AQE on** (coalesce partitions, skew-join splitting, runtime
  re-planning) so shuffle partition counts adapt to real data sizes.
- **Broadcast threshold raised** so dimension tables in star joins
  (region/nation/supplier/part at any SF) broadcast instead of shuffling
  the fact table.
- **UTC session timezone** so timestamp semantics are stable across
  driver/executor locales (and match the DuckDB oracle).
- **Arrow enabled** for any pandas interchange (pandas UDFs, toPandas).

``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
coalesces down after each exchange. On a real cluster set it to
~2-3x total cores via ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "spark-kafka-airflow-pipeline-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: runtime stats beat static planning ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing (pre-AQE bound) ---
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.default.parallelism", str(cpus))
        # --- star-schema joins: broadcast every dimension that fits ---
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- deterministic timestamp semantics (matches DuckDB oracle) ---
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP, not
        # NTZ — watermarks and numeric ts casts require TIMESTAMP
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # --- Arrow for all Python<->JVM batch interchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- scan sizing: 128m splits keep 100TB scans at ~800k tasks ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- straggler mitigation: re-launch tasks stuck on a slow /
        #     descheduled core (matters on contended hosts AND at
        #     1000-executor scale) ---
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "3")
        .config("spark.speculation.quantile", "0.9")
        # --- quieter local runs ---
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
