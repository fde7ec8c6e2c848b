"""Non-ASCII byte-semantics parity for the multimodal operators.

The Spark kernels operate on UTF-8 bytes of ``encode(text)``; the DuckDB
oracles decode the same bytes from ``hex(encode(text))``. The sf
fixtures happen to be pure ASCII, so this test plants multi-byte UTF-8
(accented Latin, CJK, emoji) and asserts kernel/oracle agreement — the
divergence the r2 ADVICE flagged for char-indexed oracles.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_kafka_airflow_pipeline_spark.operators import multimodal
from tests.oracle_harness import compare

TEXTS = [
    "héllo wörld — ünïcode",
    "知识就是力量，信息就是财富。" * 40,  # multi-frame CJK payload
    "mixed ascii and 中文 and emoji 🚀🔥" * 30,
    "plain ascii control case",
    "",
]


@pytest.fixture(scope="module")
def nonascii_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nonascii")
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(nonascii_dir):
    con = duckdb.connect()
    # Spark writes a part-file directory, DuckDB wants the file glob
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{nonascii_dir}/documents.parquet/*.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(multimodal.ORACLES))
def test_nonascii_byte_parity(name, spark, nonascii_dir, con):
    df = multimodal.QUERIES[name](spark, nonascii_dir)
    problems = compare(df, con, multimodal.ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("fn", [multimodal.multimodal_features,
                                multimodal.multimodal_arrow_features])
def test_kernel_ground_truth(fn, spark, nonascii_dir):
    """Pin BOTH kernels (mapInPandas and the vectorized mapInArrow
    twin) against pure-Python byte math (so the parity test can't pass
    via a shared wrong assumption). TEXTS ends with an empty doc — the
    reduceat segment-boundary edge the arrow kernel must mask."""
    rows = {r["doc_id"]: r for r in fn(spark, nonascii_dir).collect()}
    for i, t in enumerate(TEXTS):
        b = t.encode("utf-8")
        assert rows[i]["n_bytes"] == len(b)
        assert rows[i]["first_byte"] == (b[0] if b else -1)
        assert rows[i]["checksum_mod"] == (sum(b) % 251)


def test_shard_plan_partitions_and_balances(spark, sf_dir):
    """Shards must partition every item, be contiguous in doc_id order
    (fetch ranges never interleave), and stay under target + one max
    item."""
    import pyarrow.parquet as pq

    from spark_kafka_airflow_pipeline_spark.operators.multimodal import (
        MM_SHARDS,
        multimodal_shard_plan,
    )

    out = sorted(multimodal_shard_plan(spark, sf_dir).collect(),
                 key=lambda r: r.shard)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    sizes = {d["doc_id"]: len(d["text"].encode("utf-8")) for d in docs}
    total = sum(sizes.values())
    target = -(-total // MM_SHARDS)
    assert sum(r.n_items for r in out) == len(sizes)
    assert sum(r.shard_bytes for r in out) == total
    for a, b in zip(out, out[1:]):
        assert a.max_doc_id < b.min_doc_id
    assert all(r.shard_bytes <= target + max(sizes.values()) for r in out)
