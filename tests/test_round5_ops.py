"""Independent semantic checks for the round-5 operators — each query
also has a DuckDB oracle, but an oracle that mirrors the implementation
cannot catch a shared misconception, so the key property of each op is
re-derived here by a different route (numpy brute force, counting
identities, determinism re-runs)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_kafka_airflow_pipeline_spark.operators import (
    events as ev_ops,
    scaleops,
    similarity,
    textops,
)
from spark_kafka_airflow_pipeline_spark.operators.base import table


def test_hard_negative_is_argmax_other_label(spark, sf_dir):
    """Brute-force (numpy) the closest different-label vector for every
    anchor and compare ids — the whole point of the miner."""
    rows = table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: (r["label"], np.asarray(r["embedding"], dtype=np.float64))
            for r in rows}
    got = {r["anchor_id"]: (r["negative_id"], r["cosine_sim"]) for r in
           similarity.hard_negative_mining(spark, sf_dir).collect()}
    assert set(got) == {i for i in vecs if i < similarity.N_QUERIES}
    for aid, (nid, sim) in got.items():
        a_label, a = vecs[aid]
        best = max(
            ((round(float(np.dot(a, c) / (np.linalg.norm(a) * np.linalg.norm(c))), 6), -cid)
             for cid, (c_label, c) in vecs.items() if c_label != a_label),
        )
        assert (-best[1], best[0]) == (nid, sim), aid
        assert vecs[nid][0] != a_label


def test_weighted_mixture_rates_and_determinism(spark, sf_dir):
    """Realized keep-rates track the configured thresholds (binomial
    tolerance), and two runs keep literally identical doc sets."""
    d = table(spark, sf_dir, "documents")
    totals = {r["source"]: r["count"] for r in
              d.groupBy("source").count().collect()}
    kept = {r["source"]: r["n_docs"] for r in
            textops.weighted_mixture_sample(spark, sf_dir).collect()}
    for src, thr in textops.MIXTURE_RATES.items():
        if src not in totals:
            continue
        rate = int(thr, 16) / 16 ** 4
        n, k = totals[src], kept.get(src, 0)
        # 4-sigma binomial band
        tol = 4 * math.sqrt(n * rate * (1 - rate)) + 1
        assert abs(k - n * rate) <= tol, (src, k, n, rate)
    again = {r["source"]: r["n_docs"] for r in
             textops.weighted_mixture_sample(spark, sf_dir).collect()}
    assert kept == again


def test_quality_percentile_keeps_fraction(spark, sf_dir):
    """Per language, percent_rank < 0.4 keeps ceil-ish 40% of docs:
    exactly the count of ranks r with (r-1)/(n-1) < 0.4."""
    d = table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    kept = {r["lang"]: r["n_kept"] for r in
            textops.quality_percentile_filter(spark, sf_dir).collect()}
    for lang, n in totals.items():
        if n == 1:
            expected = 1  # percent_rank of a single row is 0.0 < 0.4
        else:
            expected = sum(1 for r in range(1, n + 1) if (r - 1) / (n - 1) < 0.4)
        assert kept.get(lang, 0) == expected, (lang, n)


def test_length_bucket_packing_identities(spark, sf_dir):
    """Bucket ids bounded, per-doc waste < bucket width (except the
    overflow bucket), and doc/token totals match the raw table."""
    out = textops.length_bucket_packing(spark, sf_dir).collect()
    d = table(spark, sf_dir, "documents")
    from spark_kafka_airflow_pipeline_spark.functions import text as T
    import pyspark.sql.functions as F
    n_docs = d.count()
    n_tokens = d.select(F.sum(T.token_count("text"))).first()[0]
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["total_tokens"] for r in out) == n_tokens
    for r in out:
        assert 0 <= r["bucket"] <= 31
        if r["bucket"] < 31:
            # every doc pads strictly less than one bucket width
            assert 0 < r["padding_waste"] <= r["n_docs"] * 128


def test_zscore_outliers_are_outliers(spark, sf_dir):
    """Re-derive z per type in numpy and band-check: everything the
    engine flags exceeds |z| > 2.999 by the numpy derivation, and
    everything clearly past the cut (|z| > 3.001) is flagged. The band
    absorbs last-ulp divergence between numpy's accumulation and the
    engine's exact decimal-sum derivation at the rounded boundary."""
    rows = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
    z_of = {}
    for t, vals in by_type.items():
        arr = np.asarray([v for _, v in vals], dtype=np.float64)
        mean, sd = arr.mean(), arr.std(ddof=1)
        for (eid, v) in vals:
            z_of[eid] = abs((v - mean) / sd)
    got = {r["event_id"] for r in
           ev_ops.events_zscore_outliers(spark, sf_dir).collect()}
    assert all(z_of[eid] > 2.999 for eid in got)
    clearly_out = {eid for eid, z in z_of.items() if z > 3.001}
    assert clearly_out <= got
    assert got  # the cut actually fires on this data


def test_bloom_join_matches_plain_join(spark, sf_dir):
    """The bloom-filtered join must be answer-identical to the plain
    join (runtime filters are semantically invisible)."""
    import pyspark.sql.functions as F
    got = scaleops.bloom_filter_join(spark, sf_dir).collect()[0]
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"))
    li = table(spark, sf_dir, "lineitem")
    plain = (li.join(o, li.l_orderkey == o.o_orderkey)
             .agg(F.count(F.lit(1)).alias("n_lines")).first())
    assert got["n_lines"] == plain["n_lines"]


def test_scd2_ranges_tile_each_user_timeline(spark, sf_dir):
    """SCD2 invariants: per user the version ranges chain (next
    valid_from == previous valid_to), exactly one open (is_current)
    version exists, and no two consecutive versions share a tier."""
    from spark_kafka_airflow_pipeline_spark.operators import warehouse
    rows = warehouse.scd2_user_tier_history(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, versions in by_user.items():
        versions.sort(key=lambda r: r["valid_from"])
        assert sum(1 for v in versions if v["is_current"]) == 1
        assert versions[-1]["is_current"] and versions[-1]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["tier"] != b["tier"], uid


def test_upsert_keeps_latest_per_user(spark, sf_dir):
    """The merged snapshot's per-user row must be the max-(ts,event_id)
    event across base and batch, recomputed independently."""
    import pyspark.sql.functions as F
    from spark_kafka_airflow_pipeline_spark.operators import warehouse
    got = {r["user_id"]: (r["last_type"], r["from_side"], r["n_versions"])
           for r in warehouse.upsert_latest_events(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type").collect()
    latest: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    for r in ev:
        counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        key = (r["ts"], r["event_id"])
        if r["user_id"] not in latest or key > latest[r["user_id"]][0]:
            side = "base" if r["event_id"] % 5 != 0 else "batch"
            latest[r["user_id"]] = (key, r["event_type"], side)
    assert set(got) == set(latest)
    for uid, (_, etype, side) in latest.items():
        assert got[uid][0] == etype and got[uid][1] == side
        assert got[uid][2] == counts[uid]


def test_partial_agg_rollup_internal_consistency(spark, sf_dir):
    """avg re-derives from merged sum/count; totals cover the table."""
    from spark_kafka_airflow_pipeline_spark.operators import warehouse
    out = warehouse.partial_agg_rollup(spark, sf_dir).collect()
    d = table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == d.count()
    for r in out:
        assert abs(r["avg_tokens"] - r["total_tokens"] / r["n_docs"]) < 1e-6
        assert r["min_chars"] <= r["max_chars"]


def test_zorder_tiles_cover_all_orders(spark, sf_dir):
    """Tile counts sum to the full table and tile ids fit the 32-bit
    curve's top byte."""
    out = scaleops.zorder_layout(spark, sf_dir).collect()
    n = table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in out) == n
    assert all(0 <= r["z_tile"] <= 255 for r in out)
