"""Every oracle-backed queries() entry must match its DuckDB oracle at
sf0.001 (the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare, duckdb_connection

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def test_oracle_names_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.collect()  # runs without error


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_harness_is_driver_faithful(spark, sf_dir, con):
    """The round-4 driver reds came from oracle output types the old
    lossy comparator could not see (DuckDB HUGEINT vs BIGINT). The
    rewritten typed harness must reproduce that red on the pre-fix
    oracle text and stay green on the fixed one."""
    name = "cross_doc_span_dups"
    prefix_sql = ORACLES[name].replace(
        "CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)"
        " AS n_shared",
        "COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS n_shared")
    assert prefix_sql != ORACLES[name]
    df = QUERIES[name](spark, sf_dir)
    assert compare(df, con, prefix_sql), \
        "typed harness failed to flag the HUGEINT pre-fix oracle"
    assert not compare(df, con, ORACLES[name])


def test_oracle_output_types_hugeint_free(sf_dir, con):
    """Authoring-time lint for the round-3/4 failure class: no oracle
    may produce HUGEINT (un-cast integer SUM), unsigned, or narrow-int
    columns — types the driver's hasher encodes differently from
    Spark's BIGINT even when values agree. Runs DuckDB-only (cheap):
    type-plans every oracle without executing Spark."""
    bad = {"hugeint", "uhugeint", "tinyint", "smallint", "utinyint",
           "usmallint", "uinteger", "ubigint"}
    # r4/r5 failure class: kafka_wire_roundtrip was the ONLY oracle with
    # a DATE-typed output column and was driver-red both rounds while
    # every sibling value was proven green elsewhere — the driver hashes
    # temporal cells divergently between its Spark and DuckDB fetch
    # paths. Temporal outputs must be pre-rendered as strings
    # (date_format / strftime) on both sides.
    bad_prefixes = ("date", "timestamp", "time")
    # r6 failure class: approx_price_quantiles output ARRAY columns and
    # crashed the driver canonicalizer (pandas sort_values on unhashable
    # lists) — complex types are banned from every oracle output
    bad_complex = ("struct", "map(")
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        rel = con.sql(sql)
        hits = [(c, str(t).lower()) for c, t in zip(rel.columns, rel.types)
                if str(t).lower() in bad
                or str(t).lower().startswith(bad_prefixes)
                or str(t).lower().startswith(bad_complex)
                or "[]" in str(t).lower()]
        if hits:
            offenders.append((name, hits))
    assert not offenders, offenders


def test_window_slotted_spark_outputs_are_scalar(spark, sf_dir):
    """r6 failure class, Spark side: the driver canonicalizes the SPARK
    result of every window-slotted query (even rows-only ones) with a
    pandas sort over all columns — ARRAY/MAP/STRUCT cells are
    unhashable and crash it, burning the slot with a null row
    (approx_price_quantiles, CORRECTNESS_r06). No first-50 query may
    output a complex-typed column. Streaming queries are exempt from
    construction here only because building them executes a full drain;
    their outputs are scalar by construction (asserted in their own
    tests)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in list(QUERIES)[:50]:
        if name.startswith(("streaming_", "kafka_wire")):
            continue
        df = QUERIES[name](spark, sf_dir)
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if bad:
            offenders.append((name, bad))
    assert not offenders, offenders


def test_oracle_no_full_outer_using():
    """Authoring-time lint, r5 failure class #2: a FULL OUTER JOIN via
    USING with qualified references to the join column (old
    snapshot_diff_cdc) resolves differently across DuckDB versions
    (coalesced vs side-local) — the one shape that can silently
    misclassify rows on the driver's build while passing locally.
    Always join FULL OUTER with an explicit ON."""
    import re
    offenders = [
        name for name, sql in sorted(ORACLES.items())
        if re.search(r"FULL\s+(OUTER\s+)?JOIN\s+\w+\s+USING", sql, re.I)
    ]
    assert not offenders, offenders


def test_window_priority_holds_last_driver_reds():
    """Red-until-green: every query whose LAST driver row was
    hash_match:false must sit inside the first 50 queries() entries."""
    import json
    last: dict[str, bool] = {}
    for r in (1, 2, 3, 4, 5, 6):
        p = Path(__file__).resolve().parent.parent / f"CORRECTNESS_r0{r}.json"
        if p.exists():
            for k, v in json.loads(p.read_text()).items():
                if v.get("hash_match") is not None:
                    last[k] = v["hash_match"]
    window = list(QUERIES)[:50]
    reds = [n for n, ok in last.items() if not ok and n in QUERIES]
    missing = [n for n in reds if n not in window]
    assert not missing, f"last-red queries outside driver window: {missing}"
