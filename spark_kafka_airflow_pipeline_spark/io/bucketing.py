"""Bucketed-table writes: the co-located-join primitive for 100 TB.

A fact-fact join shuffles BOTH sides on the join key every query. If
the tables are written ``bucketBy(N, key)`` into the catalog, Spark
records the hash-partitioning in the table metadata and a join on the
bucket key plans with NO Exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join/aggregate
on that key. This is the storage-layout half of the engine's scale
posture (PLANS.md covers the planner half).

Catalog note: ``bucketBy`` requires ``saveAsTable`` (bucket metadata
lives in the catalog, not in parquet footers); the default in-memory /
local Hive-less catalog supports it. ``sortBy`` within buckets
additionally removes the per-task Sort from sort-merge joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 32, sort_within: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table keyed on ``bucket_col``."""
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(n_buckets, bucket_col))
    if sort_within:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog; a plain ``spark.read.parquet`` on the files would lose
    it)."""
    return spark.table(table_name)
