"""Source/sink format round-trips (SURVEY §2.2 'Scans/sources') and the
approximate-distinct accuracy bound."""

from __future__ import annotations

import pytest

from spark_kafka_airflow_pipeline_spark import parse_metadata, PipelineExecutor
from spark_kafka_airflow_pipeline_spark.io.sinks import write_sink
from spark_kafka_airflow_pipeline_spark.io.sources import read_source
from spark_kafka_airflow_pipeline_spark.metadata import Sink, Source
from spark_kafka_airflow_pipeline_spark.operators.relational import (
    approx_distinct_customers,
)

ROWS = [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)]
SCHEMA = "id long, name string, score double"


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_sink_source_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_sink(df, Sink(input="x", name=f"out-{fmt}", paths=[str(tmp_path)],
                        format=fmt, saveMode="overwrite",
                        options={"header": "true"} if fmt == "csv" else {}))
    src = Source(name="s", path=f"{tmp_path}/out-{fmt}", format=fmt,
                 options={"header": "true"} if fmt == "csv" else {},
                 schema=SCHEMA if fmt in ("csv", "json") else None)
    back = read_source(spark, src)
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    assert got == sorted(ROWS)


def test_xml_format_roundtrip(spark, sf_dir, tmp_path):
    """Native XML source/sink (Spark 4): an orders subset written as
    XML and read back must round-trip values exactly."""
    from pyspark.sql import functions as F

    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_orderstatus",
                   F.col("o_totalprice").cast("decimal(12,2)")
                   .cast("string").alias("price"))
           .limit(40))
    out = str(tmp_path / "xml_out")
    (src.write.format("xml").option("rootTag", "orders")
     .option("rowTag", "order").mode("overwrite").save(out))
    # explicit schema: inference would coerce '88094.30' to double
    # 88094.3 and break the exact round-trip
    back = (spark.read.format("xml").option("rowTag", "order")
            .schema("o_orderkey long, o_orderstatus string, price string")
            .load(out))
    a = {(r.o_orderkey, r.o_orderstatus, r.price) for r in src.collect()}
    b = {(r.o_orderkey, r.o_orderstatus, r.price) for r in back.collect()}
    assert a == b and a


def test_partitioned_sink_layout(spark, tmp_path):
    """Engine extension: partitionBy on file sinks (partition pruning is
    the first-order 100 TB lever)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_sink(df, Sink(input="x", name="bypart", paths=[str(tmp_path)],
                        format="parquet", saveMode="overwrite",
                        partitionBy=["id"]))
    assert (tmp_path / "bypart" / "id=1").exists()
    back = spark.read.parquet(f"{tmp_path}/bypart")
    assert back.count() == 3


import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_approx_distinct_within_rsd(spark, sf):
    """HLL++ accuracy bound at every SF the driver exercises — the one
    no_oracle driver row, kept honest here (rsd=0.05 default; assert a
    2x-rsd envelope)."""
    rows = approx_distinct_customers(spark, f"/root/testdata/{sf}").collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_customers"] - r["exact_customers"]) / max(
            r["exact_customers"], 1)
        assert rel_err < 0.1, (sf, r)


def test_compact_parquet_small_files(spark, sf_dir, tmp_path):
    """200 tiny files -> one size-targeted file; rows and values
    survive the rewrite bit-for-bit."""
    from spark_kafka_airflow_pipeline_spark.io.maintenance import (
        compact_parquet,
    )

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(200).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/part-*")) == 200

    n = compact_parquet(spark, src, dst)
    assert n == 1  # sf0.001 orders ~ a few hundred KB << 128 MB target
    assert len(glob.glob(f"{dst}/part-*")) == 1
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b

    import pytest
    with pytest.raises(ValueError):
        compact_parquet(spark, src, src)


def test_percentile_approx_merge_rank_exactness(spark):
    """percentile_approx's merge path, pinned the way the HLL rollup's
    union is: per-partition Greenwald-Khanna partials merged to one
    summary must preserve the rank guarantee under EVERY merge topology
    (1 partition = no merging, 5 and 32 = different merge trees). At
    100 TB only the merged path exists, so the sketch is safe exactly
    when merging cannot degrade the n/accuracy rank bound. Also pins
    determinism: the same topology twice yields the identical value
    (round-robin repartition sorts within partitions, so the merge
    input — hence the summary — is reproducible)."""
    import bisect

    from pyspark.sql import functions as F

    from spark_kafka_airflow_pipeline_spark.operators.base import table

    sf = "/root/testdata/sf0.01"
    o = table(spark, sf, "orders").select("o_totalprice")
    vals = sorted(r[0] for r in o.collect())
    n, acc = len(vals), 10000
    expr = F.expr(
        f"percentile_approx(o_totalprice, array(0.5D, 0.9D, 0.99D), {acc})")
    for parts in (1, 5, 32):
        got = o.repartition(parts).agg(expr).first()[0]
        again = o.repartition(parts).agg(expr).first()[0]
        assert got == again, f"nondeterministic at {parts} partitions"
        for p, av in zip((0.5, 0.9, 0.99), got):
            lo = bisect.bisect_left(vals, av)
            hi = bisect.bisect_right(vals, av) - 1
            target, slack = p * (n - 1), n / acc + 1
            assert lo - slack <= target <= hi + slack, (parts, p, av)


def test_hll_rollup_merge_exactness_and_accuracy(spark):
    """The HLL rollup's two load-bearing claims:

    1. MERGE-LOSSLESSNESS: the __all__ row (union of per-type sketches)
       must equal a single sketch built over the whole column in one
       pass — register-wise max is exact, so the estimates are
       bit-identical, not merely close. This is what makes sketch
       rollups safe at 100 TB (pre-aggregate per partition/day, union
       later, never rescan).
    2. ACCURACY: every estimate within a generous HLL error envelope of
       the exact distinct count.
    """
    from pyspark.sql import functions as F

    from spark_kafka_airflow_pipeline_spark.operators.base import table
    from spark_kafka_airflow_pipeline_spark.operators.scaleops import (
        hll_distinct_rollup,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r["event_type"]: r for r in hll_distinct_rollup(spark, sf).collect()}
    ev = table(spark, sf, "events")

    global_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))).first()[0]
    assert rows["__all__"]["approx_users"] == global_est

    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["__all__"] = ev.select("user_id").distinct().count()
    for etype, r in rows.items():
        rel_err = abs(r["approx_users"] - exact[etype]) / max(exact[etype], 1)
        assert rel_err < 0.05, (etype, r["approx_users"], exact[etype])
