"""Unit tests for the pure-expression function library (vectors, text)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.functions import text as T
from spark_kafka_airflow_pipeline_spark.functions import vectors as V


def test_cosine_similarity_known_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 2.0], [2.0, 4.0]),
         ([1.0, 0.0], [-1.0, 0.0])],
        "a array<double>, b array<double>")
    out = [r[0] for r in df.select(V.cosine_similarity("a", "b")).collect()]
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(-1.0)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])],
                               "a array<double>, b array<double>")
    assert df.select(V.cosine_similarity("a", "b")).collect()[0][0] is None


def test_l2_and_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    assert df.select(V.l2_norm("a")).collect()[0][0] == pytest.approx(5.0)
    normed = df.select(V.normalize("a")).collect()[0][0]
    assert normed == pytest.approx([0.6, 0.8])


def test_l2_distance(spark):
    df = spark.createDataFrame([([0.0, 0.0], [3.0, 4.0])],
                               "a array<double>, b array<double>")
    assert df.select(V.l2_distance("a", "b")).collect()[0][0] == pytest.approx(5.0)


def test_hyperplane_signature_deterministic(spark):
    df = spark.createDataFrame([([0.5, -0.2, 0.8],)], "a array<double>")
    sig1 = df.select(V.random_hyperplane_signs("a", 8)).collect()[0][0]
    sig2 = df.select(V.random_hyperplane_signs("a", 8)).collect()[0][0]
    assert sig1 == sig2
    assert len(sig1) == 8 and set(sig1) <= {0, 1}
    bucket = df.select(V.bits_to_bucket(
        V.random_hyperplane_signs("a", 8))).collect()[0][0]
    assert 0 <= bucket < 256


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("a  b\tc",)], "t string")
    out = [r[0] for r in df.select(T.token_count("t")).collect()]
    assert out == [0, 0, 1, 3]


def test_stopword_and_punct_ratio(spark):
    df = spark.createDataFrame([("the cat of doom",), ("!!!",)], "t string")
    stop = [r[0] for r in df.select(T.stopword_ratio("t")).collect()]
    assert stop[0] == pytest.approx(0.5)  # 'the','of' of 4 tokens
    punct = [r[0] for r in df.select(T.punctuation_ratio("t")).collect()]
    assert punct[1] == pytest.approx(1.0)


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], "t string")
    fps = [r[0] for r in df.select(T.fingerprint("t")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    sh = df.select(T.shingles("t", 3)).collect()[0][0]
    assert sorted(sh) == ["a b c", "b c d"]
    # short doc: whole doc as one shingle
    short = spark.createDataFrame([("a b",)], "t string")
    assert short.select(T.shingles("t", 3)).collect()[0][0] == ["a b"]
    pair = spark.createDataFrame([(["x", "y"], ["y", "z"])],
                                 "a array<string>, b array<string>")
    assert pair.select(T.jaccard("a", "b")).collect()[0][0] == pytest.approx(1 / 3)


def test_minhash_signature_identical_texts_match(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",),
                                ("the quick brown fox jumps",),
                                ("entirely different words here now",)],
                               "t string")
    sigs = (df.select(T.minhash_signature(T.shingles("t", 3), 16).alias("s"))
            .collect())
    assert sigs[0]["s"] == sigs[1]["s"]
    assert sigs[0]["s"] != sigs[2]["s"]
    assert len(sigs[0]["s"]) == 16


def test_simhash_similar_texts_close(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the quick brown fox jumps over the lazy cat",),
         ("zzz qqq completely unrelated wwwww text kkk",)], "t string")
    sigs = [r[0] for r in df.select(T.simhash64("t")).collect()]

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[0], sigs[1]) < hamming(sigs[0], sigs[2])


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is fine for all of us to rest",),
         ("!!!! ???? ####",)], "t string")
    scores = [r[0] for r in df.select(T.quality_score("t")).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


# Edge-case parity for the zip_with shingle/ngram reconstruction (the
# HOF-capture fix): outputs must equal the obvious Python definition on
# every boundary shape — short docs, repeated whitespace, unicode,
# empties — not just the happy-path corpus.
_EDGE_TEXTS = [
    "",
    " ",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines mixed\t in",
    "UPPER lower MiXeD case",
    "héllo wörld ünïcode tëxt here",
    "中文 分词 测试 文本 数据",
    "a a a a a",
    "ab",
    "abc",
    "abcd",
]


def _py_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) <= k:
        return list(dict.fromkeys([" ".join(toks)])) if toks else [""]
    out = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return list(dict.fromkeys(out))


def _py_char_ngrams(text: str, n: int = 3) -> list[str]:
    t = text.strip().lower()
    if len(t) <= n:
        return [t]
    out = [t[i:i + n] for i in range(len(t) - n + 1)]
    return list(dict.fromkeys(out))


def test_shingles_match_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_EDGE_TEXTS)],
                               "i long, t string")
    rows = {r["i"]: list(r["s"]) for r in
            df.select("i", T.shingles("t", 3).alias("s")).collect()}
    for i, t in enumerate(_EDGE_TEXTS):
        assert rows[i] == _py_shingles(t, 3), (t, rows[i], _py_shingles(t, 3))


def test_char_ngrams_match_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_EDGE_TEXTS)],
                               "i long, t string")
    rows = {r["i"]: list(r["s"]) for r in
            df.select("i", T.char_ngrams("t", 3).alias("s")).collect()}
    for i, t in enumerate(_EDGE_TEXTS):
        assert rows[i] == _py_char_ngrams(t, 3), \
            (t, rows[i], _py_char_ngrams(t, 3))
