"""The plan lint (scripts/explain_plans.py) must still flag REAL
anti-patterns after the round-5 bounded-broadcast exemptions — a lint
that waves everything through is worse than none."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_spec = importlib.util.spec_from_file_location(
    "explain_plans", Path(__file__).resolve().parent.parent
    / "scripts" / "explain_plans.py")
ep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ep)


def test_raw_scaling_broadcast_still_flags(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = li.join(F.broadcast(o),
                  li.l_orderkey == o.o_orderkey)   # raw table broadcast
    flags = ep.hard_broadcast_hints_on_scaling_tables(bad)
    assert any(f.startswith("!! hard broadcast hint over orders")
               for f in flags), flags


def test_aggregated_broadcast_is_exempt(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stats = li.agg(F.count(F.lit(1)).alias("n"))
    ok = li.crossJoin(F.broadcast(stats))
    flags = ep.hard_broadcast_hints_on_scaling_tables(ok)
    assert not any(f.startswith("!!") for f in flags), flags
    assert any("ok)" in f for f in flags), flags


def test_literal_sliced_broadcast_is_exempt(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding")
    ok = emb.crossJoin(F.broadcast(queries))
    flags = ep.hard_broadcast_hints_on_scaling_tables(ok)
    assert not any(f.startswith("!!") for f in flags), flags


def test_filtered_but_unbounded_broadcast_still_flags(spark, sf_dir):
    """A non-literal filter (selectivity unknown, scales with data)
    earns no exemption."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    filtered = o.filter(F.col("o_orderstatus") == "F")  # data-sized
    bad = li.join(F.broadcast(filtered),
                  li.l_orderkey == filtered.o_orderkey)
    flags = ep.hard_broadcast_hints_on_scaling_tables(bad)
    assert any(f.startswith("!! hard broadcast hint over orders")
               for f in flags), flags
