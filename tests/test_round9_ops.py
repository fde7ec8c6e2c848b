"""Round-9 tests: independent Python replays of the new operators
(Nelson-Aalen hazard, binned EMD drift, Mann-Kendall, A/B power
planner, column profile, FD audit, skew-salt planner, association
rules) — each recomputed brute-force from the raw parquet, never via
Spark or the DuckDB oracle string."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from spark_kafka_airflow_pipeline_spark.operators import (
    evalops,
    lakeops,
    relational_extra,
    scaleops,
)


def _orders(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/orders.parquet", columns=cols).to_pylist()


def test_nelson_aalen_matches_brute_force(spark, sf_dir):
    """H(t) replayed from per-customer order dates: the risk-set walk,
    the floor-micro increments, and the KM cross-check -ln S >= H at
    every level (Jensen: -ln(1-x) >= x)."""
    rows = _orders(sf_dir, ["o_custkey", "o_orderdate", "o_orderkey"])
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["o_orderdate"], r["o_orderkey"]))
    cmax = max(r["o_orderdate"] for r in rows).date()
    obs = []
    for orders in by_cust.values():
        orders.sort()
        first = orders[0][0].date()
        if len(orders) > 1:
            obs.append(((orders[1][0].date() - first).days, 1))
        else:
            obs.append(((cmax - first).days, 0))
    levels: dict[int, list[int]] = {}
    for t, ev in obs:
        d = levels.setdefault(t, [0, 0])
        d[ev == 0] += 0  # keep shape
        if ev:
            d[0] += 1
        else:
            d[1] += 1
    n_risk = len(obs)
    expect = {}
    cum = 0
    for t in sorted(levels):
        d, cens = levels[t]
        if d >= 1:
            cum += d * 1_000_000 // n_risk
            expect[t] = (n_risk, d, cens, cum)
        else:
            cum += 0
        n_risk -= d + cens
    got = {r.t_days: r for r in
           evalops.nelson_aalen_hazard(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for t, (nr, d, cens, cum_h) in expect.items():
        r = got[t]
        assert (r.n_risk, r.d_events, r.n_censored,
                r.cum_hazard_micros) == (nr, d, cens, cum_h), t
    # KM consistency on the shared level frame: -ln S(t) >= H(t)
    km = {r.t_days: r.surv_r6 for r in
          evalops.kaplan_meier_reorder(spark, sf_dir).collect()}
    assert set(km) == set(got)
    for t, s in km.items():
        if s > 0:
            assert -math.log(s) >= got[t].cum_hazard_micros / 1e6 - 1e-4


def test_price_emd_matches_brute_force(spark, sf_dir):
    rows = _orders(sf_dir, ["o_orderdate", "o_totalprice"])
    hists: dict[str, list[int]] = {}
    for r in rows:
        mo = r["o_orderdate"].strftime("%Y-%m")
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        b = min(cents // evalops.EMD_BIN_CENTS, evalops.EMD_BINS - 1)
        hists.setdefault(mo, [0] * evalops.EMD_BINS)[b] += 1

    def cum_ppm(h):
        tot, c, out = sum(h), 0, []
        for x in h:
            c += x
            out.append(c * 1_000_000 // tot)
        return out

    months = sorted(hists)
    expect = {}
    for prev, cur in zip(months, months[1:]):
        pa, pb = cum_ppm(hists[cur]), cum_ppm(hists[prev])
        expect[cur] = (sum(hists[cur]), sum(hists[prev]),
                       sum(abs(a - b) for a, b in zip(pa, pb)))
    got = {r.month: (r.n_orders, r.n_prev, r.emd_ppm)
           for r in evalops.price_emd_drift(spark, sf_dir).collect()}
    assert got == expect
    # identity: EMD(month, same month) would be 0 — sanity on the math
    assert all(v[2] >= 0 for v in got.values())


def test_mann_kendall_matches_brute_force(spark, sf_dir):
    rows = _orders(sf_dir, ["o_orderdate", "o_totalprice"])
    monthly: dict[str, int] = {}
    for r in rows:
        mo = r["o_orderdate"].strftime("%Y-%m")
        monthly[mo] = monthly.get(mo, 0) + math.floor(
            r["o_totalprice"] * 100 + 0.5)
    c = [monthly[m] for m in sorted(monthly)]
    n = len(c)
    s = sum((cj > ci) - (cj < ci)
            for i, ci in enumerate(c) for cj in c[i + 1:])
    tie_counts: dict[int, int] = {}
    for v in c:
        tie_counts[v] = tie_counts.get(v, 0) + 1
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in tie_counts.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    row = evalops.mann_kendall_trend(spark, sf_dir).collect()[0]
    assert (row.n_months, row.s_stat, row.var18) == (n, s, var18)
    assert row.tau_r6 == round(s * 2 / (n * (n - 1)), 6)
    sign = (s > 0) - (s < 0)
    z = round((s - sign) / math.sqrt(var18 / 18.0), 6)
    assert row.z_r6 == z
    assert row.trend == ("increasing" if z * 1e6 > 1_959_964 else
                         "decreasing" if z * 1e6 < -1_959_964 else
                         "no_trend")


def test_ab_power_planner_closed_form(spark, sf_dir):
    """The integer planner vs the float textbook formula: for every
    (segment, mde) row, the integer n_per_arm equals
    ceil((za+zb)^2 (p1q1 + p2q2) / dp^2) computed on the SAME ppm
    rates (exact ceiling, never off by more than the 1 of ceil)."""
    out = evalops.ab_power_planner(spark, sf_dir).collect()
    assert {r.mde_pct for r in out} == set(evalops.AB_MDE_PCTS)
    segs = {r.segment for r in out}
    assert len(segs) == 5 and len(out) == 20
    for r in out:
        p1, p2 = r.p1_ppm / 1e6, r.p2_ppm / 1e6
        dp = p2 - p1
        n_float = (evalops.AB_C_MICRO / 1e6) * (
            p1 * (1 - p1) + p2 * (1 - p2)) / (dp * dp)
        assert abs(r.n_per_arm - math.ceil(n_float)) <= 1, r
        assert r.n_per_arm >= 1
        # monotone: bigger effect needs fewer samples per segment
    by_seg: dict[str, list] = {}
    for r in out:
        by_seg.setdefault(r.segment, []).append((r.mde_pct, r.n_per_arm))
    for pairs in by_seg.values():
        pairs.sort()
        ns = [n for _, n in pairs]
        assert ns == sorted(ns, reverse=True)


def test_orders_column_profile_matches_pyarrow(spark, sf_dir):
    rows = _orders(sf_dir, None)
    out = {r.col_name: r for r in
           lakeops.orders_column_profile(spark, sf_dir).collect()}
    assert set(out) == {n for n, _ in lakeops.PROFILE_COLS}
    keys = [r["o_orderkey"] for r in rows]
    assert out["o_orderkey"].n_rows == len(rows)
    assert out["o_orderkey"].n_null == 0
    assert out["o_orderkey"].n_distinct == len(set(keys))
    assert out["o_orderkey"].min_str == str(min(keys))
    assert out["o_orderkey"].max_str == str(max(keys))
    cents = [math.floor(r["o_totalprice"] * 100 + 0.5) for r in rows]
    assert out["o_totalprice_cents"].min_str == str(min(cents))
    assert out["o_totalprice_cents"].max_str == str(max(cents))
    assert out["o_totalprice_cents"].n_distinct == len(set(cents))
    dates = [r["o_orderdate"].date() for r in rows]
    assert out["o_orderdate"].min_str == min(dates).isoformat()
    assert out["o_orderdate"].max_str == max(dates).isoformat()
    stat = [r["o_orderstatus"] for r in rows]
    assert out["o_orderstatus"].n_distinct == len(set(stat))


def test_functional_dependencies_match_pyarrow(spark, sf_dir):
    out = {(r.table_name, r.determinant, r.dependent): r
           for r in lakeops.functional_dependency_audit(
               spark, sf_dir).collect()}
    assert len(out) == len(lakeops.FD_CANDIDATES)
    # the two schema-guaranteed FDs hold; the behavioral ones don't
    assert out[("orders", "o_orderkey", "o_custkey")].holds == 1
    assert out[("nation", "n_nationkey", "n_regionkey")].holds == 1
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey"]).to_pylist()
    per: dict[int, set] = {}
    for r in li:
        per.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
    viol = sum(1 for v in per.values() if len(v) > 1)
    r = out[("lineitem", "l_orderkey", "l_suppkey")]
    assert r.n_keys == len(per)
    assert r.n_violating_keys == viol
    assert r.max_dependents_per_key == max(len(v) for v in per.values())
    assert r.holds == (1 if viol == 0 else 0)


def test_skew_salt_planner_matches_pyarrow(spark, sf_dir):
    out = {r.key_col: r for r in
           scaleops.skew_salt_planner(spark, sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id"]).to_pylist()
    per: dict[int, int] = {}
    for r in ev:
        per[r["user_id"]] = per.get(r["user_id"], 0) + 1
    total, mx = len(ev), max(per.values())
    target = max(total // scaleops.SALT_DENOM, scaleops.SALT_MIN_TARGET)
    r = out["events.user_id"]
    assert (r.total_rows, r.n_keys, r.max_key_rows) == (
        total, len(per), mx)
    assert r.target_rows == target
    assert r.n_keys_over_target == sum(1 for m in per.values()
                                       if m > target)
    assert r.max_salt_n == (mx + target - 1) // target
    # lineitem baskets cap at 7 lines: never needs salting
    assert out["lineitem.l_orderkey"].max_salt_n == 1


def test_association_rules_consistent_with_pairs(spark, sf_dir):
    pairs = relational_extra.frequent_part_pairs(spark, sf_dir).collect()
    rules = {(r.antecedent, r.consequent): r
             for r in relational_extra.association_rules_lift(
                 spark, sf_dir).collect()}
    assert len(rules) == 2 * len(pairs)
    for p in pairs:
        fwd = rules[(p.part1, p.part2)]
        rev = rules[(p.part2, p.part1)]
        assert fwd.support == rev.support == p.support
        assert fwd.lift_ppm == rev.lift_ppm == p.lift_ppm
        assert fwd.confidence_ppm == p.support * 1_000_000 // p.n1
        assert rev.confidence_ppm == p.support * 1_000_000 // p.n2
        # confidence is a probability
        assert 0 < fwd.confidence_ppm <= 1_000_000
