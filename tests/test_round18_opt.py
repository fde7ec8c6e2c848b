"""Focused pins for the r18 optimization rewrites (the round's rule:
an optimization that changes an operator's internals gains a test).

- ngram_jaccard_md5_pairs grew an EXACT bucket-count upper-bound
  prefilter before the signature-agreement and array-verify stages;
  the full pipeline is replayed here in pure Python (same md5-derived
  hashes, same permutation coefficients, same banding, same agreement
  floor, same HALF_UP 6dp rounding) so a bound that ever dropped a
  true pair — or admitted a wrong one — fails against an independent
  reference, not against another Spark plan.
- _supplier_topk_edges switched from distinct + self-join to a
  per-order collect_set + higher-order pair expansion; edge WEIGHTS
  (co-order counts) are pinned against a brute-force Python replay.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from itertools import permutations

import pytest


def _round6_half_up(x: Decimal) -> Decimal:
    return x.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _python_ngram_md5_pairs(docs: dict[int, str], threshold: float):
    """Independent replay of the whole md5 char-trigram pipeline:
    gram sets, 32-family minhash signatures, 4x8 banding, agreement
    floor, exact jaccard with HALF_UP 6dp rounding."""
    from spark_kafka_airflow_pipeline_spark.operators.dedup import (
        _MH_P, _NG_BANDS, _NG_COEFFS, _NG_ROWS, _ng_est_min)

    def grams_of(text: str) -> set[int]:
        t = text.strip().lower()
        gs = {t} if len(t) <= 3 else {t[i:i + 3] for i in range(len(t) - 2)}
        return {int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % _MH_P
                for g in gs}

    hs = {d: grams_of(t) for d, t in docs.items()}
    sig = {d: [min((a * h + b) % _MH_P for h in g)
               for (a, b) in _NG_COEFFS]
           for d, g in hs.items() if g}
    buckets: dict[tuple, list[int]] = {}
    for d, s in sig.items():
        for j in range(_NG_BANDS):
            key = (j, tuple(s[j * _NG_ROWS:(j + 1) * _NG_ROWS]))
            buckets.setdefault(key, []).append(d)
    cand = {(a, b) for ds in buckets.values()
            for a, b in permutations(sorted(ds), 2) if a < b}
    floor = _ng_est_min(threshold)
    out = {}
    for a, b in cand:
        agree = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
        if agree < floor:
            continue
        inter = len(hs[a] & hs[b])
        union = len(hs[a] | hs[b])
        j = _round6_half_up(Decimal(inter) / Decimal(union))
        if j >= Decimal(str(threshold)):
            out[(a, b)] = float(j)
    return out


@pytest.mark.parametrize("threshold", [0.9, 0.5])
def test_ngram_md5_pairs_match_python_replay(spark, sf_dir, threshold):
    from spark_kafka_airflow_pipeline_spark.operators.dedup import (
        ngram_jaccard_md5_pairs)

    docs = {r.doc_id: r.text
            for r in (spark.read.parquet(f"{sf_dir}/documents.parquet")
                      .select("doc_id", "text").collect())}
    want = _python_ngram_md5_pairs(docs, threshold)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in ngram_jaccard_md5_pairs(spark, sf_dir,
                                            threshold).collect()}
    assert set(got) == set(want), (
        f"pair set drift: only-spark={set(got) - set(want)} "
        f"only-python={set(want) - set(got)}")
    for p, j in want.items():
        assert abs(got[p] - j) < 1e-9, (p, got[p], j)


def test_ngram_bound_prefilter_is_exact_upper_bound(spark, sf_dir):
    """The mod-32 bucket-count bound must dominate the true
    intersection for every candidate pair (the invariant the prune's
    safety proof rests on), checked over the real corpus' gram sets."""
    from pyspark.sql import functions as F

    from spark_kafka_airflow_pipeline_spark.operators.dedup import (
        _MH_P, _NG_BOUND_BUCKETS)

    docs = {r.doc_id: r.text
            for r in (spark.read.parquet(f"{sf_dir}/documents.parquet")
                      .select("doc_id", "text").collect())}

    def grams_of(text: str) -> set[int]:
        t = text.strip().lower()
        gs = {t} if len(t) <= 3 else {t[i:i + 3] for i in range(len(t) - 2)}
        return {int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % _MH_P
                for g in gs}

    hs = {d: grams_of(t) for d, t in docs.items() if t is not None}
    ids = sorted(hs)[:40]  # bounded quadratic check
    for i, a in enumerate(ids):
        ca = Counter(h % _NG_BOUND_BUCKETS for h in hs[a])
        for b in ids[i + 1:]:
            cb = Counter(h % _NG_BOUND_BUCKETS for h in hs[b])
            bound = min(sum(min(ca[k], cb[k]) for k in range(
                _NG_BOUND_BUCKETS)), len(hs[a]), len(hs[b]))
            assert bound >= len(hs[a] & hs[b]), (a, b)


def test_tokenize_not_inlined_into_generated_filters(spark, sf_dir):
    """(r17 ADVICE) The raw_shingles_of 'materialized attribute'
    contract is otherwise enforced only by convention: Spark 4.1's
    InferFiltersFromGenerate + filter pushdown can re-inline a gram
    construction into a per-row `size(...) > 0` Filter over live
    lineage (the quadratic blocking_quality_report trap r17 fixed with
    a barrier). Pin the plan shape at the two un-barriered explode
    call sites the ADVICE named: no Filter node may contain the
    tokenizing split()/transform() expression, and the winnow pipeline
    must tokenize exactly once. A Spark upgrade that silently restores
    the O(tokens^2) path fails here, not in a timing sweep."""
    from spark_kafka_airflow_pipeline_spark.operators import corpusops
    from spark_kafka_airflow_pipeline_spark.operators import textops
    from spark_kafka_airflow_pipeline_spark.operators.base import table

    d = table(spark, sf_dir, "documents")
    for name, df in (
            ("_winnow_selected", textops._winnow_selected(d)),
            ("kmv_source_overlap",
             corpusops.kmv_source_overlap(spark, sf_dir))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = [ln.strip()[:160] for ln in plan.splitlines()
               if "Filter" in ln
               and ("split(" in ln or "transform(" in ln)]
        assert not bad, (name, bad)
    winnow_plan = (textops._winnow_selected(d)
                   ._jdf.queryExecution().executedPlan().toString())
    assert winnow_plan.count("split(") == 1, (
        "winnow tokenize no longer runs exactly once")


def test_asof_cogroup_variants_survive_pruning_consumers(spark, sf_dir):
    """(r17 ADVICE) Both cogroup as-of variants must run under a
    PRUNING consumer (count()), not only the collecting oracle
    harness: with both sides filtered off ONE scan, Spark 4.1's
    attribute dedup + column pruning strips the right side to the
    grouping key and the kernel crashes (the latent r17
    asof_cogroup_arrow bug). The separate-scan shape is the fix; this
    pins it for BOTH variants so a future 'cleanup' back to a shared
    scan fails fast. Counts must also agree with the collecting path."""
    from spark_kafka_airflow_pipeline_spark.operators.events import (
        asof_cogroup_arrow, asof_cogroup_pandas)

    n_arrow = asof_cogroup_arrow(spark, sf_dir).count()
    n_pandas = asof_cogroup_pandas(spark, sf_dir).count()
    assert n_arrow == n_pandas
    assert n_arrow == len(asof_cogroup_arrow(spark, sf_dir).collect())


def test_topk_edges_weights_brute_force(spark, sf_dir):
    """Edge weights from the r18 collect_set + HOF pair expansion must
    equal brute-force co-order counts (and the top-k cap must keep the
    strongest neighbors with the w-desc, dst-asc tie rule)."""
    from pyspark.sql import functions as F  # noqa: F401

    from spark_kafka_airflow_pipeline_spark.operators import graphops

    rows = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_orderkey", "l_suppkey").distinct().collect())
    orders: dict[int, set[int]] = {}
    for r in rows:
        orders.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    w = Counter()
    for sks in orders.values():
        for a, b in permutations(sorted(sks), 2):
            w[(a, b)] += 1
    want: dict[int, list[tuple[int, int]]] = {}
    by_src: dict[int, list[tuple[float, int]]] = {}
    for (a, b), c in w.items():
        by_src.setdefault(a, []).append((c, b))
    for src, lst in by_src.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        want[src] = lst[:graphops.TOPK_NEIGHBORS]
    got: dict[int, list[tuple[float, int]]] = {}
    for r in graphops._supplier_topk_edges(spark, sf_dir).collect():
        got.setdefault(r.src, []).append((r.w, r.dst))
    for src in got:
        got[src].sort(key=lambda t: (-t[0], t[1]))
    assert set(got) == set(want)
    for src in want:
        assert [(float(c), d) for c, d in want[src]] == got[src], src
