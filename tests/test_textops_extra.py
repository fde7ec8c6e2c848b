"""Semantics of the incremental-ingestion / span-dup / packing ops on
planted fixtures (their corpus-level parity is covered by
test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from spark_kafka_airflow_pipeline_spark.operators.textops import (
    context_packing_stats,
    cross_doc_span_dups,
    incremental_dedup_exact,
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """4 'corpus' docs (src1) + 4 'new batch' docs (src0):
    doc 10 duplicates corpus doc 1 (modulo case/whitespace), docs 11+12
    duplicate each other inside the batch, doc 13 is unique."""
    rows = [
        (1, "alpha beta gamma delta", "en", "src1"),
        (2, "wholly unrelated corpus text", "en", "src1"),
        (3, "another corpus document entirely", "en", "src1"),
        (4, "the fourth corpus entry", "en", "src1"),
        (10, "  ALPHA   beta GAMMA delta ", "en", "src0"),
        (11, "fresh new batch content here", "en", "src0"),
        (12, "fresh new batch content here", "en", "src0"),
        (13, "a genuinely novel document", "en", "src0"),
    ]
    d = tmp_path_factory.mktemp("textops") / "planted"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_incremental_dedup_exact(spark, planted_dir):
    out = {r["doc_id"]: r["n_batch_copies"]
           for r in incremental_dedup_exact(spark, planted_dir).collect()}
    # doc 10 collides with corpus doc 1 -> dropped entirely;
    # 11/12 collapse to min id 11 with 2 copies; 13 survives alone
    assert out == {11: 2, 13: 1}


def test_cross_doc_span_dups_flags_shared_spans(spark, planted_dir):
    ratios = {r["doc_id"]: r["span_dup_ratio"]
              for r in cross_doc_span_dups(spark, planted_dir).collect()}
    # exact duplicates share every gram (with each other / across split)
    assert ratios[11] == 1.0 and ratios[12] == 1.0
    assert ratios[1] == 1.0 and ratios[10] == 1.0
    # unique docs share nothing
    assert ratios[13] == 0.0 and ratios[2] == 0.0


def test_incremental_dedup_minhash_cross_side_only(spark, tmp_path):
    """A new doc that's a light edit of a corpus doc must be caught;
    new-new and corpus-corpus pairs must never be emitted."""
    from spark_kafka_airflow_pipeline_spark.operators.dedup import (
        incremental_dedup_minhash,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the miller watches the river turn the ancient wheel")
    rows = [
        (1, base, "en", "src1"),
        (2, "completely different corpus text about spark physical plans "
            "and shuffle exchanges in adaptive execution", "en", "src1"),
        # near-dup of corpus doc 1 (one word changed), in the new batch
        (10, base.replace("lazy", "sleepy"), "en", "src0"),
        # two identical docs INSIDE the new batch: must NOT pair
        (11, "intra batch duplicate content alpha beta gamma delta "
             "epsilon zeta eta theta iota kappa", "en", "src0"),
        (12, "intra batch duplicate content alpha beta gamma delta "
             "epsilon zeta eta theta iota kappa", "en", "src0"),
    ]
    d = tmp_path / "inc"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .write.mode("overwrite").parquet(str(d / "documents.parquet"))
    pairs = {(r["new_doc_id"], r["corpus_doc_id"])
             for r in incremental_dedup_minhash(spark, str(d)).collect()}
    assert (10, 1) in pairs
    assert all(a in (10, 11, 12) and b in (1, 2) for a, b in pairs), pairs


def test_context_packing_windows(spark, tmp_path):
    # 5 docs of 3 tokens in one source, window of 8 tokens:
    # starts 0,3,6,9,12 -> windows 0,0,0,1,1
    rows = [(i, "tok tok tok", "en", "srcX") for i in range(5)]
    d = tmp_path / "pack"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = {r["win_id"]: (r["n_docs"], r["win_tokens"])
           for r in context_packing_stats(spark, str(d),
                                          window_tokens=8).collect()}
    assert out == {0: (3, 9), 1: (2, 6)}


def test_raw_shingles_of_matches_raw_shingles(spark):
    """raw_shingles_of over a materialized token column must be
    byte-identical (content AND per-doc order) to raw_shingles on the
    text — the r17 optimization swapped the k-1 zip_with accumulator
    for one slice+concat_ws per shingle; any divergence here would
    silently change every md5-oracled gram family."""
    from pyspark.sql import functions as F

    from spark_kafka_airflow_pipeline_spark.functions import text as T

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "one two"),                      # shorter than k=3 and k=8
        (3, "single"),                       # 1 token
        (4, "  padded   whitespace\ttabs  and   runs  "),
        (5, "rep rep rep rep rep rep rep rep rep rep"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (3, 8):
        a = d.select(
            "doc_id",
            F.posexplode(T.raw_shingles("text", k)).alias("pos", "g"))
        b = (d.select("doc_id", T.split_tokens("text").alias("toks"))
             .select("doc_id",
                     F.posexplode(T.raw_shingles_of(F.col("toks"), k))
                     .alias("pos", "g")))
        assert a.exceptAll(b).count() == 0, f"k={k}: a-b"
        assert b.exceptAll(a).count() == 0, f"k={k}: b-a"
