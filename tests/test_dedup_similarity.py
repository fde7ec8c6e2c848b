"""Semantic tests for dedup + similarity operators (the rows-only ones
whose correctness the DuckDB oracle can't see)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    """Tiny documents table with planted near-duplicates."""
    base = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets over the quiet hills and the river runs cold")
    rows = [
        (0, base, "en", "src0", len(base)),
        (1, base, "en", "src1", len(base)),                      # exact dup of 0
        (2, base.replace("cold", "warm"), "en", "src2", len(base)),  # near dup
        (3, "completely unrelated short text", "en", "src3", 31),
        (4, "another separate document with its own words entirely "
            "unlike anything else present here", "en", "src4", 90),
    ]
    d = tmp_path_factory.mktemp("docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_lsh_finds_planted_dups(spark, doc_dir):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_lsh_pairs(spark, doc_dir).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5    # near dup
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_buckets_group_exact_dups(spark, doc_dir):
    groups = dedup.simhash_buckets(spark, doc_dir).collect()
    assert any(g["doc_ids"] == "0,1" or g["doc_ids"].startswith("0,1")
               for g in groups)


def test_ngram_jaccard_dups(spark, doc_dir):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             dedup.ngram_jaccard_dups(spark, doc_dir, threshold=0.8).collect()}
    assert (0, 1) in pairs


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """The LSH path is approximate; assert it (a) returns only true
    cosine values and (b) achieves nonzero recall of the exact top-k."""
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(spark, sf_dir).collect()}
    approx_rows = similarity.ann_lsh_topk(spark, sf_dir).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    assert approx, "LSH returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall > 0.05, f"suspiciously low LSH recall: {recall}"


def test_label_centroid_similarity_bounds(spark, sf_dir):
    rows = similarity.label_centroid_similarity(spark, sf_dir).collect()
    assert rows
    assert all(-1.0001 <= r["centroid_sim"] <= 1.0001 for r in rows)
