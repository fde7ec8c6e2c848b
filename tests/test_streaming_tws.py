"""transformWithStateInPandas operator — the Spark 4 stateful API.

The operator's state server needs the ``protobuf`` package; in
environments without it (this sandbox) the test documents the gate and
skips, and the driver contract omits the query (pipelines._tws_available).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_kafka_airflow_pipeline_spark.streaming import pipelines as s


def test_tws_gate_consistency():
    """The query is registered iff the dependency exists."""
    assert ("streaming_tws_purchase_stats" in s.QUERIES) == s._tws_available()
    assert ("streaming_tws_purchase_stats" in s.ORACLES) == s._tws_available()


@pytest.mark.skipif(not s._tws_available(),
                    reason="protobuf not installed (environment-bound)")
def test_tws_matches_batch_oracle(spark, sf_dir):
    from tests.oracle_harness import compare, duckdb_connection

    con = duckdb_connection(sf_dir)
    df = s.streaming_tws_purchase_stats(spark, sf_dir)
    assert not compare(df, con, s.STREAMING_TWS_SQL)
