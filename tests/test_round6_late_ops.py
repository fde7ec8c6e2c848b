"""Round-6 late additions: winnowing fingerprints (MOSS), temperature
mixture weights, embedding-cosine dedup clustering — algorithm-level
properties beside the oracle parity checks."""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_kafka_airflow_pipeline_spark.operators import similarity, textops


def _ref_winnow(text: str, k: int = 3, w: int = 4) -> set[int]:
    """Independent Python reference of the (k, w) winnowing scheme with
    the same md5-derived 40-bit gram hash and rightmost-minimum tie
    rule as ``textops._winnow_selected``."""
    toks = text.strip().lower().split()
    if len(toks) <= k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
    keys = [h * (1 << 20) + ((1 << 20) - 1 - p) for p, h in enumerate(hs)]
    n = len(keys)
    sel = set()
    for s in range(max(n - w + 1, 1)):
        sel.add(min(keys[s:s + w]))
    return {kk >> 20 for kk in sel}


def _spark_winnow(spark, docs: list[tuple[int, str]]) -> dict[int, set[int]]:
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = textops._winnow_selected(df).collect()
    out: dict[int, set[int]] = {i: set() for i, _ in docs}
    for r in rows:
        out[r["doc_id"]].add(r["fp"])
    return out


def test_winnow_matches_python_reference(spark):
    """The distributed winnowing pass selects exactly the fingerprints
    the sequential reference algorithm selects, per document."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one two three"),                       # exactly k tokens
        (3, "tiny doc"),                            # < k tokens
        (4, ""),                                    # empty text
        (5, "a a a a a a a a a a"),                 # all-identical grams
        (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    ]
    got = _spark_winnow(spark, docs)
    for doc_id, text in docs:
        assert got[doc_id] == _ref_winnow(text), f"doc {doc_id}"


def test_winnow_shared_run_guarantee(spark):
    """The (k=3, w=4) guarantee: two documents sharing a run of
    k+w-1 = 6 tokens share at least one fingerprint, and identical
    documents share ALL fingerprints."""
    shared = "omega psi chi phi upsilon tau"  # 6-token shared run
    docs = [
        (1, f"unrelated head words here {shared} and a different tail"),
        (2, f"{shared} entirely other continuation tokens follow now"),
        (3, "completely disjoint vocabulary nothing in common whatsoever"),
        (4, f"unrelated head words here {shared} and a different tail"),
    ]
    got = _spark_winnow(spark, docs)
    assert got[1] & got[2], "6-token shared run must share a fingerprint"
    assert got[1] == got[4], "identical docs share all fingerprints"
    assert not (got[3] & got[1])


def test_declarative_fingerprint_matches_operator(spark, sf_dir):
    """`fingerprint` transformation type: metadata-declared winnowing
    summaries must equal the oracled winnow_fingerprints operator,
    with the input schema preserved through the annotate join."""
    from spark_kafka_airflow_pipeline_spark.executor import (
        PipelineExecutor,
    )
    from spark_kafka_airflow_pipeline_spark.metadata import parse_metadata
    from spark_kafka_airflow_pipeline_spark.operators import textops

    meta = parse_metadata({"dataflows": [{
        "name": "fp",
        "sources": [{"name": "docs",
                     "path": f"{sf_dir}/documents.parquet"}],
        "transformations": [
            {"name": "tagged", "type": "fingerprint", "params": {
                "input": "docs", "idColumn": "doc_id",
                "textColumn": "text"}},
        ],
        "sinks": [],
    }]})
    nodes = PipelineExecutor(spark).build_nodes(meta.dataflows[0])
    got = {(r["doc_id"], r["n_fps"], r["fp_xor"], r["fp_min"])
           for r in nodes["tagged"]
           .select("doc_id", "n_fps", "fp_xor", "fp_min").collect()}
    want = {(r["doc_id"], r["n_fps"], r["fp_xor"], r["fp_min"])
            for r in textops.winnow_fingerprints(spark, sf_dir).collect()}
    assert got == want and got
    src_cols = set(spark.read.parquet(
        f"{sf_dir}/documents.parquet").columns)
    assert src_cols <= set(nodes["tagged"].columns)


def test_winnow_overlap_df_cap_blocks_boilerplate(spark, tmp_path):
    """The MOSS df-cap: a boilerplate sentence shared by 70 documents
    (> max_df=64) contributes NO pairs — its fingerprints are dropped
    before the self-join, so corpus-wide boilerplate cannot go
    quadratic — while a genuine 2-document near-dup (df=2) is still
    found."""
    from spark_kafka_airflow_pipeline_spark.operators import textops as t

    boiler = "this boilerplate footer appears on every page of the site"
    dup = ("completely original duplicated essay about winnowing "
           "schemes covering selection density guarantees tie rules "
           "packing positions and portability across engines")
    docs = [(i, f"unique{i}a unique{i}b unique{i}c {boiler} tail{i}",
             "en", "w", 1) for i in range(70)]
    docs += [(100, f"{dup} first variant ending"),
             (101, f"{dup} second variant ending")]
    docs = [(d[0], d[1], "en", "w", 1) if len(d) == 2 else d for d in docs]
    df = spark.createDataFrame(
        docs, "doc_id int, text string, lang string, source string, "
              "n_chars int")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r["doc_a"], r["doc_b"])
             for r in t.winnow_overlap(spark, str(tmp_path)).collect()}
    assert (100, 101) in pairs
    assert all(a == 100 and b == 101 for a, b in pairs), pairs


def test_longest_shared_spans_planted_run(spark, tmp_path):
    """A planted 12-token exact shared substring between two otherwise
    disjoint documents is reported as exactly a 12-token span (5 runs
    of 8-grams); a pair sharing only scattered single grams reports
    the minimum span."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"  # 12 tokens
    filler_a = " ".join(f"a{i}" for i in range(20))
    filler_b = " ".join(f"b{i}" for i in range(20))
    docs = [
        (1, f"{filler_a} {shared} {'z1 z2 z3 z4 z5'}", "en", "w", 1),
        (2, f"{filler_b} {shared} {'y1 y2 y3 y4 y5'}", "en", "w", 1),
        (3, "totally different text with no overlap at all here", "en",
         "w", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id int, text string, lang string, source string, "
              "n_chars int")
    out = str(tmp_path / "documents.parquet")
    df.write.parquet(out)
    from spark_kafka_airflow_pipeline_spark.operators import textops as t
    rows = {(r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
            for r in t.longest_shared_spans(spark, str(tmp_path),
                                            min_grams=1).collect()}
    assert rows == {(1, 2): 12}


def test_mixture_temperature_flattens(spark, sf_dir):
    """alpha=0.5 temperature weights: ppm weights are a (near-)unit
    partition, the head language is down-weighted vs its raw share and
    the tail language is up-weighted."""
    rows = textops.mixture_temperature_weights(spark, sf_dir).collect()
    total_w = sum(r["weight_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_w <= 1_000_000
    head = max(rows, key=lambda r: r["n_docs"])
    tail = min(rows, key=lambda r: r["n_docs"])
    assert head["weight_ppm"] <= head["share_ppm"]
    assert tail["weight_ppm"] >= tail["share_ppm"]


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join handling — the complement of the static
    salting operator (`salted_group_agg`): a join keyed on a hot key
    (5/6 of all rows on one value) is re-planned at runtime into split
    subpartitions, visible as SortMergeJoin(skew=true) in the executed
    plan. Results are unchanged; only the partitioning is. This pins
    that the engine's scale posture for skewed joins (AQE on, no manual
    salting needed for moderate skew) actually activates."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300000).select(
            F.when(F.col("id") < 250000, F.lit(0))
            .otherwise((F.col("id") % 50) + 1).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(0, 51).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = left.join(right, "k")
        # collect THIS frame (count() would execute a different plan
        # and leave joined's own AQE plan unfinalized)
        assert len(joined.collect()) == 300000  # every left row matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rocksdb_state_store_matches_default(spark, sf_dir):
    """The RocksDB state store provider — the at-scale backend whose
    state lives off-heap/on-disk instead of in executor memory — yields
    byte-identical results to the default HDFS-backed provider for a
    watermarked aggregation and a stateful dedup. This pins that every
    streaming topology here can run with production state sizing by
    flipping one conf, no code change."""
    from spark_kafka_airflow_pipeline_spark.streaming import (
        pipelines as sp,
    )

    names = ("streaming_tumbling_window", "streaming_dedup_keys")
    base = {n: sorted(map(tuple, sp.QUERIES[n](spark, sf_dir).collect()))
            for n in names}
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        for n in names:
            rocks = sorted(map(tuple, sp.QUERIES[n](spark, sf_dir)
                               .collect()))
            assert rocks == base[n], n
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_pushdown_prunes_partitions(spark):
    """pushFilters on the seqgen reader: range predicates on id clamp
    the planned range (unit-level: partitions() bounds shrink; only
    consumed filters disappear), and the e2e scan result equals the
    unpushed filter semantics."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from spark_kafka_airflow_pipeline_spark.io import pydatasource

    r = pydatasource._SeqReader({"n": "1000", "partitions": "4"})
    residual = list(r.pushFilters([
        GreaterThanOrEqual(("id",), 600),
        LessThan(("id",), 800),
        StringStartsWith(("tag",), "a"),      # not pushable -> residual
        EqualTo(("bucket",), 3),              # wrong column -> residual
    ]))
    assert {type(f).__name__ for f in residual} == {
        "StringStartsWith", "EqualTo"}
    parts = r.partitions()
    assert min(p.start for p in parts) == 600
    assert max(p.end for p in parts) == 800
    assert len(parts) == 4

    # empty clamp -> one empty split, scan yields zero rows
    r2 = pydatasource._SeqReader({"n": "1000", "partitions": "4"})
    list(r2.pushFilters([GreaterThanOrEqual(("id",), 900),
                         LessThan(("id",), 100)]))
    parts2 = r2.partitions()
    assert len(parts2) == 1 and parts2[0].start == parts2[0].end

    # e2e: pushed scan == in-memory filter of the full scan
    pydatasource.register(spark)
    full = (spark.read.format("seqgen").option("n", "2000")
            .option("partitions", "4").load().collect())
    expect = sorted(r["id"] for r in full if 250 <= r["id"] < 1250)
    pushed = (spark.read.format("seqgen").option("n", "2000")
              .option("partitions", "4").load()
              .filter("id >= 250 and id < 1250").collect())
    assert sorted(r["id"] for r in pushed) == expect


def test_approx_quantiles_rank_bound(spark, sf_dir):
    """percentile_approx's contract: each reported value sits within
    rank n/accuracy of the target order statistic. The query now
    computes that check itself (scalar ``ok_p*`` flags — the r6 driver
    canonicalizer crashed on the old ARRAY output); this test pins the
    flags true and independently recomputes the rank window for the
    p50 sketch against the fully sorted per-group values."""
    import bisect

    from pyspark.sql import functions as F

    from spark_kafka_airflow_pipeline_spark.operators import relational

    rows = relational.approx_price_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r["ok_p50"], r["ok_p90"], r["ok_p99"]) == (1, 1, 1), r
    # independent recomputation (one group, p50) so the flag logic
    # itself is cross-checked, not just trusted
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderpriority", "o_totalprice").collect()
    by_group: dict[str, list[float]] = {}
    for r in orders:
        by_group.setdefault(r["o_orderpriority"], []).append(
            r["o_totalprice"])
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    approx = (o.groupBy("o_orderpriority")
              .agg(F.expr("percentile_approx(o_totalprice, 0.5D, 10000)")
                   .alias("a50")).collect())
    for r in approx:
        vals = sorted(by_group[r["o_orderpriority"]])
        n = len(vals)
        slack = n / 10000 + 1
        lo = bisect.bisect_left(vals, r["a50"])
        hi = bisect.bisect_right(vals, r["a50"]) - 1
        target = 0.5 * (n - 1)
        assert lo - slack <= target <= hi + slack, (
            r["o_orderpriority"], r["a50"], lo, hi, target)


def test_embedding_dup_clusters_match_union_find(spark, sf_dir):
    """The distributed min-label fixpoint produces exactly the
    connected components a sequential union-find derives from the same
    (oracled) pair graph."""
    pairs = [(r["id_a"], r["id_b"]) for r in
             similarity.embedding_near_dups(spark, sf_dir, threshold=0.35)
             .select("id_a", "id_b").collect()]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, int] = {}
    for node in parent:
        comps[find(node)] = comps.get(find(node), 0) + 1
    expected = {(cid, n) for cid, n in comps.items() if n > 1}

    got = {(r["cluster_id"], r["n_vecs"]) for r in
           similarity.embedding_dup_clusters(spark, sf_dir).collect()}
    assert got == expected
    assert got, "fixture corpus must contain at least one dup cluster"
