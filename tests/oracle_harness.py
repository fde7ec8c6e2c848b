"""Local twin of the driver's correctness gate: run a queries() entry in
Spark and its oracle_sql() in DuckDB on the same parquet tables, compare
row count + column names + order-insensitive TYPED values.

Driver-faithfulness (round-5 rework): the r1-r4 harness normalized
``Decimal -> float`` and stripped timezones before comparing, which was
lossy in exactly the places the driver's value hasher is strict — the
round-3/4 ``hash_match: false`` rows (DuckDB HUGEINT from un-cast integer
SUMs; a double-sum vs decimal-sum) all passed the old local compare.
This version fetches BOTH sides through Arrow and compares
``(type-class, canonical rendering)`` pairs per cell:

- ``Decimal`` keeps its scale (``str``), so ``HUGEINT``/``decimal128(38,0)``
  from DuckDB can never silently equal a Spark ``bigint``;
- ``int`` and ``float`` are distinct classes (``5`` != ``5.0``);
- tz-aware datetimes are canonicalized to their UTC instant, naive ones
  kept verbatim — the engine pins ``spark.sql.session.timeZone=UTC`` so a
  Spark TIMESTAMP (UTC-aware through Arrow) matches the same parquet
  micros read by DuckDB as naive only when the instants truly agree.

Calibration: with the pre-fix round-4 oracles this harness reproduces all
three driver reds (see ``tests/test_oracle_parity.py::test_harness_is_
driver_faithful``) and stays green on driver-green queries.
"""

from __future__ import annotations

import math
from datetime import date, datetime, timezone
from decimal import Decimal

import duckdb

from spark_kafka_airflow_pipeline_spark.operators.base import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    """(type-class, rendering) — two cells are equal iff both components
    match, so a type divergence is a mismatch even when values are
    numerically equal (that is exactly what the driver's hasher sees)."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, Decimal):
        return ("dec", "NaN" if v.is_nan() else str(v))
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(e) for e in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return (type(v).__name__, repr(v))


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions; empty == parity."""
    problems: list[str] = []
    cols = sorted(spark_df.columns)
    spark_tbl = spark_df.toArrow()
    spark_data = {c: spark_tbl.column(c).to_pylist() for c in cols}
    spark_rows = [tuple(_canon(spark_data[c][i]) for c in cols)
                  for i in range(spark_tbl.num_rows)]

    duck_tbl = con.sql(sql).arrow()
    duck_cols = duck_tbl.column_names
    if sorted(duck_cols) != cols:
        problems.append(f"columns differ: spark={cols} duckdb={sorted(duck_cols)}")
        return problems
    duck_data = {c: duck_tbl.column(c).to_pylist() for c in cols}
    duck_rows = [tuple(_canon(duck_data[c][i]) for c in cols)
                 for i in range(duck_tbl.num_rows)]

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
