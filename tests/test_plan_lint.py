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


def test_global_ntile_over_raw_data_flags(spark, sf_dir):
    """The r6 RFM scale-killer shape: un-partitioned ntile over a
    data-sized frame must flag."""
    from pyspark.sql import Window as Wn
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("monetary"))
    # aggregate keyed on a data-sized key is NOT bounded: the Aggregate
    # exemption must not fire just because an Aggregate exists — the
    # frame still scales with customers
    bad = per_cust.withColumn(
        "m", F.ntile(5).over(Wn.orderBy(F.desc("monetary"), "o_custkey")))
    flags = ep.unpartitioned_windows(bad)
    assert flags, "global ntile over per-customer frame must flag"


def test_global_window_over_raw_scan_flags(spark, sf_dir):
    from pyspark.sql import Window as Wn
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = o.withColumn("rn", F.row_number().over(Wn.orderBy("o_orderkey")))
    assert ep.unpartitioned_windows(bad)


def test_partitioned_window_is_exempt(spark, sf_dir):
    from pyspark.sql import Window as Wn
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ok = o.withColumn("rn", F.row_number().over(
        Wn.partitionBy("o_custkey").orderBy("o_orderkey")))
    assert not ep.unpartitioned_windows(ok)


def test_topk_filtered_global_window_is_exempt(spark, sf_dir):
    """row_number()<=k above an un-partitioned window is bounded by
    Spark 4's WindowGroupLimit pushdown — top-k, not a full ranking."""
    from pyspark.sql import Window as Wn
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    topk = (o.withColumn("rn", F.row_number().over(
        Wn.orderBy(F.desc("o_totalprice"), "o_orderkey")))
        .filter(F.col("rn") <= 10))
    assert not ep.unpartitioned_windows(topk)


def test_rfm_after_rework_is_lint_clean(spark, sf_dir):
    """The r7 rework (global_row_number + ntile arithmetic) must leave
    NO un-partitioned window over unbounded input: the only global
    window left ranks the <= num_partitions-row pid-offset aggregate."""
    from spark_kafka_airflow_pipeline_spark.operators import relational_extra

    df = relational_extra.customer_rfm_segments(spark, sf_dir)
    assert not ep.unpartitioned_windows(df)


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


def _load_plan_sweep():
    """Import the mechanized all-queries sweep (VERDICT r7 ask #2)."""
    import sys as _sys
    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    if scripts not in _sys.path:
        _sys.path.insert(0, scripts)
    spec = importlib.util.spec_from_file_location(
        "plan_sweep", Path(scripts) / "plan_sweep.py")
    ps = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ps)
    return ps


def test_sweep_flags_injected_global_ntile(spark, sf_dir):
    """The mechanized sweep must catch the exact r6 RFM scale-killer if
    it were ever (re)introduced as a queries() entry: a global ntile
    over a customer-sized frame with no partition spec."""
    from pyspark.sql import Window as Wn
    from pyspark.sql import functions as F

    ps = _load_plan_sweep()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = (o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("m"))
           .withColumn("tile", F.ntile(4).over(Wn.orderBy("m"))))
    hard = ps.flags_for(bad, "injected_global_ntile_fixture")
    assert any("un-partitioned window" in f for f in hard), hard


def test_sweep_passes_descale_killed_rfm(spark, sf_dir):
    """...and the fixed two-phase-ranking RFM passes the same filter."""
    import __spark_entry__ as entry_mod

    ps = _load_plan_sweep()
    df = entry_mod.queries()["customer_rfm_segments"](spark, sf_dir)
    assert ps.flags_for(df, "customer_rfm_segments") == []
