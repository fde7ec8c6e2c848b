"""Graph operator invariants + plan shape (oracle parity is covered by
test_oracle_parity's parametrized sweep)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_kafka_airflow_pipeline_spark.operators import graphops


def test_pagerank_is_a_distribution(spark, sf_dir):
    rows = graphops.pagerank_supplier_rank(spark, sf_dir).collect()
    assert rows, "empty rank vector"
    total = sum(r.pagerank for r in rows)
    # 0.15/N leaks nothing; weighted contributions conserve mass up to
    # the per-rank rounding (8 decimals) and nodes nobody links to
    assert abs(total - 1.0) < 1e-4, total
    assert all(r.pagerank > 0 for r in rows)


def test_pagerank_no_cartesian(spark, sf_dir):
    """The rank loop must be joins + aggregations; the only cross join
    allowed is the broadcast 1-row N scalar."""
    plan = graphops.pagerank_supplier_rank(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_triangle_invariants(spark, sf_dir):
    row = graphops.triangle_count_suppliers(spark, sf_dir).collect()[0]
    assert row.n_nodes > 0
    # top-k sparsification: undirected degree is bounded by 2k, so
    # edges <= n_nodes * k (each node contributes at most k out-edges)
    assert row.n_edges <= row.n_nodes * graphops.TOPK_NEIGHBORS
    assert 0 <= row.n_triangles
    assert 0.0 <= row.clustering_coeff <= 1.0


def test_topk_edges_degree_cap(spark, sf_dir):
    from pyspark.sql import functions as F

    edges = graphops._supplier_topk_edges(spark, sf_dir)
    mx = edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert mx <= graphops.TOPK_NEIGHBORS
