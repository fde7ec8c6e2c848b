"""Round-8 tests: ADVICE-item fixes (upsert state-loss guard,
weighted-quantile cast portability, link-prediction deg-1 guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_upsert_sink_corrupt_state_raises(spark, tmp_path):
    """A state table that EXISTS but cannot be read (corrupt/partial
    parquet after a crash) must fail the merge loudly — never be
    silently replaced by the incoming batch (the CDC data-loss mode the
    existence-gated read prevents)."""
    from spark_kafka_airflow_pipeline_spark.io.sinks import write_sink
    from spark_kafka_airflow_pipeline_spark.metadata import Sink

    sink = Sink(input="x", name="st", paths=[str(tmp_path)],
                format="upsert", saveMode="append",
                options={"keys": "k", "orderBy": "v"})
    b1 = spark.createDataFrame([(1, 10)], "k long, v long")
    write_sink(b1, sink)
    # corrupt the state table: junk bytes where parquet footers live
    state = tmp_path / "st"
    for f in state.glob("*.parquet"):
        f.write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        write_sink(spark.createDataFrame([(2, 5)], "k long, v long"), sink)
    # and the corrupt-but-present state was NOT overwritten by b2 alone
    assert any(f.read_bytes() == b"not a parquet file"
               for f in state.glob("*.parquet"))


def test_state_table_exists(spark, tmp_path):
    from spark_kafka_airflow_pipeline_spark.io.sinks import state_table_exists

    assert not state_table_exists(spark, str(tmp_path / "missing"))
    (tmp_path / "present").mkdir()
    assert state_table_exists(spark, str(tmp_path / "present"))


def test_weighted_median_floor_before_cast(spark):
    """p25 landing on x.5 doubled-cents must floor identically on both
    engines: prices 4.02 and 4.08 with equal weight put the 0.25
    quantile at 403.5 doubled-cents -> floor 403 (Spark trunc-cast and
    DuckDB round-half-even would otherwise disagree: 403 vs 404)."""
    df = spark.createDataFrame(
        [("A", 402), ("A", 408)], "flag string, cents long")
    got = (df.groupBy("flag")
           .agg(F.floor(F.percentile(F.col("cents") * 2, F.lit(0.25),
                                     F.lit(1))).cast("bigint").alias("p25"))
           ).collect()[0]
    assert got.p25 == 807  # floor(403.5 * 2) = floor(807.0); engine-stable
    import duckdb
    oracle = duckdb.sql(
        "SELECT CAST(floor(quantile_cont(c, 0.25)) AS BIGINT) FROM "
        "(VALUES (804), (816)) t(c)").fetchone()[0]
    assert oracle == got.p25


def test_link_prediction_excludes_deg1_wedge_centers(spark):
    """A degree-1 node contributes no wedges; with the deg>=2 guard its
    ln(1)=0 division can never poison aa_term.  Build a tiny graph
    where node 9 has degree 1 and check the wn relation drops it."""
    from spark_kafka_airflow_pipeline_spark.operators import graphops

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (9, 1)], "src long, dst long")
    und = (e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
           .union(e.select(F.col("dst").alias("node"),
                           F.col("src").alias("nbr")))
           .distinct())
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    wn = (und.join(deg, "node")
          .filter((F.col("deg") >= 2) & (F.col("deg") <= graphops.WEDGE_CAP)))
    centers = {r.node for r in wn.select("node").distinct().collect()}
    assert 9 not in centers and {1, 2, 3} <= centers
