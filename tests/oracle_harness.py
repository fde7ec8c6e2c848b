"""Local twin of the driver's correctness gate: run a queries() entry in
Spark and its oracle_sql() in DuckDB on the same parquet tables, compare
row count + schema-insensitive column names + order-insensitive values.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

from spark_kafka_airflow_pipeline_spark.operators.base import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions; empty == parity."""
    problems: list[str] = []
    cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]

    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_raw = duck.fetchall()
    if sorted(duck_cols) != cols:
        problems.append(f"columns differ: spark={cols} duckdb={sorted(duck_cols)}")
        return problems
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in duck_raw]

    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}")
    s_sorted = sorted(spark_rows, key=repr)
    d_sorted = sorted(duck_rows, key=repr)
    n_diff = 0
    for s, d in zip(s_sorted, d_sorted):
        if s != d:
            n_diff += 1
            if n_diff <= 3:
                problems.append(f"row diff: spark={s} duckdb={d}")
    if n_diff > 3:
        problems.append(f"... {n_diff} differing rows total")
    return problems
