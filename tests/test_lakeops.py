"""Semantic tests for the lakeops family (compaction planner, Z-order
audit, bloom sizing, feature-hashing collisions): properties a
maintenance engineer would check by hand, independent of the DuckDB
oracle agreement (covered by the auto-param parity suite)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from spark_kafka_airflow_pipeline_spark.operators import lakeops


def test_compaction_bins_are_contiguous_and_balanced(spark, sf_dir):
    """Bins must (a) partition every input file, (b) be contiguous in
    (month, priority) order — min/max month ranges of consecutive bins
    never interleave, (c) each stay under target + one max input file."""
    out = sorted(lakeops.compaction_bin_plan(spark, sf_dir).collect(),
                 key=lambda r: r.bin)
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate", "o_orderpriority"]
                           ).to_pylist()
    files: dict[tuple, int] = {}
    for o in orders:
        k = (o["o_orderdate"].strftime("%Y-%m"), o["o_orderpriority"])
        files[k] = files.get(k, 0) + 1
    total = sum(files.values()) * lakeops.EST_ROW_BYTES
    target = -(-total // lakeops.COMPACT_OUT_FILES)
    assert sum(r.n_input_files for r in out) == len(files)
    assert sum(r.bin_rows for r in out) == sum(files.values())
    # bin ids are 0..k contiguous; month ranges are ordered
    assert [r.bin for r in out] == list(range(len(out)))
    for a, b in zip(out, out[1:]):
        assert a.max_month <= b.min_month
    max_file = max(files.values()) * lakeops.EST_ROW_BYTES
    assert all(r.bin_bytes <= target + max_file for r in out)


def test_zorder_beats_linear_on_second_dimension(spark, sf_dir):
    """The audit's whole claim: the Z-order layout must shrink the
    second dimension's total span versus the linear layout (which
    leaves y unclustered at ~full width per file), while file counts
    stay equal and row totals are preserved."""
    out = {r.scheme: r
           for r in lakeops.zorder_clustering_audit(spark, sf_dir).collect()}
    z, lin = out["zorder"], out["linear"]
    assert z.n_rows == lin.n_rows
    assert z.sum_span_y < lin.sum_span_y
    # linear leaves every file's y-span near the full 1023 domain
    assert lin.sum_span_y > lin.n_files * 900
    # z-order's per-file y spans are genuinely bounded (quadrant-sized)
    assert z.max_span_y <= 1023
    assert z.sum_span_y <= z.n_files * 600


def test_morton_expr_is_a_bijection_on_the_domain(spark):
    """The DIV/%-only Morton interleave must agree with the classic
    bit-interleave on a sample grid (and hence be injective)."""
    rows = spark.sql(
        "SELECT x, y, " + lakeops._morton_expr("x", "y") + " AS m "
        "FROM (SELECT explode(sequence(0, 1023, 73)) AS x) "
        "LATERAL VIEW explode(sequence(0, 1023, 97)) t AS y").collect()

    def interleave(x, y):
        m = 0
        for i in range(lakeops.ZBITS):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m
    assert all(r.m == interleave(r.x, r.y) for r in rows)
    assert len({r.m for r in rows}) == len(rows)


def test_bloom_planner_matches_formula(spark, sf_dir):
    """k and fpr replayed with the same 6dp-rounded ln/exp ladder;
    fpr must strictly decrease as bits-per-key grows."""
    out = {r.bits_per_key: r
           for r in lakeops.bloom_filter_fpr_planner(spark,
                                                     sf_dir).collect()}
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pylist()
    n_keys = len({r["l_orderkey"] for r in li})
    probe = len(pq.read_table(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey"]).to_pylist())
    for bpk in lakeops.BLOOM_BPK:
        r = out[bpk]
        k = math.floor(bpk * 0.693147 + 0.5)
        p1 = round(math.exp(-k / bpk), 6)
        fpr = round(math.exp(k * round(math.log(1.0 - p1), 6)), 6)
        assert (r.n_keys, r.m_bits, r.k_hashes) == (n_keys, n_keys * bpk, k)
        assert r.fpr_r6 == fpr
        fp_ppm = math.floor(fpr * 1e6 + 0.5)
        assert r.expected_fp_rows == probe * fp_ppm // 10**6
    fprs = [out[b].fpr_r6 for b in sorted(out)]
    assert fprs == sorted(fprs, reverse=True)
    assert all(f > 0 for f in fprs)


def test_feature_hashing_collisions_shrink_with_buckets(spark, sf_dir):
    """More buckets -> fewer collided terms and less collided mass;
    invariants: buckets_used <= min(n_buckets, n_terms), collided mass
    share in [0, 1e6], and n_terms identical across sizes."""
    out = {r.n_buckets: r
           for r in lakeops.feature_hashing_collision_audit(
               spark, sf_dir).collect()}
    assert set(out) == set(lakeops.HASH_BUCKET_SIZES)
    terms = {r.n_terms for r in out.values()}
    assert len(terms) == 1
    for nb, r in out.items():
        assert r.buckets_used <= min(nb, r.n_terms)
        assert 0 <= r.collided_mass_ppm <= 10**6
        assert r.collided_terms >= 0
        # pigeonhole floor: at least n_terms - n_buckets terms collide
        assert r.collided_terms >= max(0, r.n_terms - nb)
    sizes = sorted(out)
    coll = [out[s].collided_terms for s in sizes]
    assert coll == sorted(coll, reverse=True)


def test_retention_tiers_partition_all_months(spark, sf_dir):
    """Tiers partition every month partition; ages replayed; expire
    tier (TPC-H spans ~7 years) must dominate partitions."""
    out = {r.tier: r
           for r in lakeops.partition_retention_plan(spark,
                                                     sf_dir).collect()}
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate"]).to_pylist()
    months: dict[tuple, int] = {}
    for o in orders:
        k = (o["o_orderdate"].year, o["o_orderdate"].month)
        months[k] = months.get(k, 0) + 1
    head = max(months)
    tiers: dict[str, list[int]] = {}
    for (y, m), n in months.items():
        age = (head[0] * 12 + head[1]) - (y * 12 + m)
        t = ("1_hot" if age <= 3 else "2_warm" if age <= 12
             else "3_cold" if age <= 24 else "4_expire")
        g = tiers.setdefault(t, [0, 0, 10**9, -1])
        g[0] += 1
        g[1] += n
        g[2] = min(g[2], age)
        g[3] = max(g[3], age)
    assert set(out) == set(tiers)
    for t, (np_, nr, mn, mx) in tiers.items():
        r = out[t]
        assert (r.n_partitions, r.n_rows) == (np_, nr)
        assert (r.min_age_months, r.max_age_months) == (mn, mx)
        assert r.est_bytes == nr * lakeops.EST_ROW_BYTES
    assert sum(r.n_partitions for r in out.values()) == len(months)
    assert out["4_expire"].n_partitions > out["1_hot"].n_partitions
