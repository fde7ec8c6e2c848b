"""Semantic tests for the evalops family (WoE/IV, AUC, Gini/Lorenz,
ACF, Kaplan-Meier): each operator is replayed independently in plain
Python/numpy from the raw parquet rows at sf0.001, so the tests pin the
STATISTIC, not just the SQL-oracle agreement (which the auto-param
parity suite already covers)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from spark_kafka_airflow_pipeline_spark.operators import evalops


def _orders(sf_dir):
    return pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()


def _customers(sf_dir):
    return pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()


def _cents(price: float) -> int:
    return math.floor(price * 100 + 0.5)


def test_woe_iv_recompute(spark, sf_dir):
    """WoE/IV per segment replayed from raw counts; identities:
    sum over segments of (pos_share - neg_share) = 0, IV >= 0 term-wise
    only when shares and WoE agree in sign (true by construction)."""
    rows = {r.c_mktsegment: r
            for r in evalops.woe_iv_segment_priority(spark, sf_dir).collect()}
    seg_c = {c["c_custkey"]: c["c_mktsegment"] for c in _customers(sf_dir)}
    pos, neg = {}, {}
    for o in _orders(sf_dir):
        s = seg_c[o["o_custkey"]]
        if o["o_orderpriority"] in ("1-URGENT", "2-HIGH"):
            pos[s] = pos.get(s, 0) + 1
        else:
            neg[s] = neg.get(s, 0) + 1
    p_tot, n_tot = sum(pos.values()), sum(neg.values())
    assert set(rows) == set(pos) | set(neg)
    for s, r in rows.items():
        assert (r.n_pos, r.n_neg) == (pos[s], neg[s])
        woe = round(math.log((pos[s] * n_tot) / (neg[s] * p_tot)), 6)
        assert r.woe_r6 == pytest.approx(woe, abs=1e-9)
        assert r.iv_r6 == pytest.approx(
            round((pos[s] / p_tot - neg[s] / n_tot) * woe, 6), abs=1e-9)


def test_auc_matches_bruteforce_pairs(spark, sf_dir):
    """auc_ppm equals the brute-force Mann-Whitney over all pos x neg
    pairs (wins + half-ties), floored to ppm."""
    got = evalops.score_auc_acctbal(spark, sf_dir).collect()[0]
    urgent = {o["o_custkey"] for o in _orders(sf_dir)
              if o["o_orderpriority"] == "1-URGENT"}
    scores = [(_cents(c["c_acctbal"]), c["c_custkey"] in urgent)
              for c in _customers(sf_dir)]
    pos = sorted(s for s, p in scores if p)
    neg = sorted(s for s, p in scores if not p)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    wins2 = 0  # 2*(wins + ties/2), exact integer
    for sp in pos:  # sf0.001: 1500x~800 pairs — fine brute force
        for sn in neg:
            wins2 += 2 if sp > sn else (1 if sp == sn else 0)
    assert got.auc_ppm == wins2 * 10**6 // (2 * len(pos) * len(neg))
    assert got.gini_ppm == 2 * got.auc_ppm - 10**6


def test_gini_lorenz_matches_python(spark, sf_dir):
    """gini_ppm equals the rank-identity replay; Lorenz deciles
    partition all customers, cum shares are monotone and end at ~1e6
    (floor division can shave <= 1 ppm)."""
    out = evalops.gini_lorenz_customers(spark, sf_dir).collect()
    per = {c["c_custkey"]: 0 for c in _customers(sf_dir)}
    for o in _orders(sf_dir):
        per[o["o_custkey"]] += _cents(o["o_totalprice"])
    xs = [v for _, v in sorted(per.items(), key=lambda kv: (kv[1], kv[0]))]
    n, tot = len(xs), sum(xs)
    s_rnx = sum(r * x for r, x in enumerate(xs, start=1))
    want_gini = (2 * s_rnx - (n + 1) * tot) * 10**6 // (n * tot)
    assert {r.gini_ppm for r in out} == {want_gini}
    assert sorted(r.decile for r in out) == list(range(1, 11))
    assert sum(r.n_customers for r in out) == n
    assert sum(r.decile_cents for r in out) == tot
    shares = [r.cum_share_ppm for r in sorted(out, key=lambda r: r.decile)]
    assert shares == sorted(shares)
    assert 10**6 - 1 <= shares[-1] <= 10**6


def test_acf_matches_numpy(spark, sf_dir):
    """acf_r6 equals the exact-integer replay of the n-scaled centered
    autocorrelation over the day-ordered revenue sequence."""
    out = {r.lag: r for r in evalops.acf_daily_revenue(spark, sf_dir).collect()}
    daily = {}
    for o in _orders(sf_dir):
        daily[o["o_orderdate"]] = (daily.get(o["o_orderdate"], 0)
                                   + _cents(o["o_totalprice"]))
    xs = [daily[d] for d in sorted(daily)]
    n, s = len(xs), sum(xs)
    c = [n * x - s for x in xs]  # exact ints
    den = sum(v * v for v in c)
    assert set(out) == set(range(1, evalops.ACF_MAX_LAG + 1))
    for k in range(1, evalops.ACF_MAX_LAG + 1):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        assert out[k].n_pairs == n - k
        assert out[k].acf_r6 == pytest.approx(round(num / den, 6), abs=1e-9)
    # lag-0 sanity is implicit (den>0); |r_k| must be a correlation
    assert all(abs(r.acf_r6) <= 1.0 for r in out.values())


def test_kaplan_meier_matches_python(spark, sf_dir):
    """The survival curve equals the textbook product-limit replay
    (with the repo's 6dp-ln accumulation); censored-only levels carry
    no output row but DO shrink the risk set."""
    out = {r.t_days: r
           for r in evalops.kaplan_meier_reorder(spark, sf_dir).collect()}
    firsts: dict[int, list] = {}
    for o in _orders(sf_dir):
        firsts.setdefault(o["o_custkey"], []).append(
            (o["o_orderdate"], o["o_orderkey"]))
    cmax = max(o["o_orderdate"] for o in _orders(sf_dir))
    levels: dict[int, list[int]] = {}
    for dates in firsts.values():
        dates.sort()
        if len(dates) >= 2:
            t, e = (dates[1][0] - dates[0][0]).days, 1
        else:
            t, e = (cmax - dates[0][0]).days, 0
        d, c = levels.setdefault(t, [0, 0])
        levels[t] = [d + e, c + (1 - e)]
    n_risk = sum(d + c for d, c in levels.values())
    cum_ln, surv = 0.0, {}
    for t in sorted(levels):
        d, c = levels[t]
        if 0 < d < n_risk:
            cum_ln += round(math.log(1.0 - d / n_risk), 6)
            surv[t] = (n_risk, d, c, round(math.exp(cum_ln), 6))
        elif d >= n_risk and d > 0:
            surv[t] = (n_risk, d, c, 0.0)
        n_risk -= d + c
    assert set(out) == set(surv)
    for t, (nr, d, c, s) in surv.items():
        r = out[t]
        assert (r.n_risk, r.d_events, r.n_censored) == (nr, d, c)
        assert r.surv_r6 == pytest.approx(s, abs=1e-9)
    # survival is non-increasing over event times
    ts = sorted(out)
    assert all(out[a].surv_r6 >= out[b].surv_r6
               for a, b in zip(ts, ts[1:]))


def test_lift_gain_deciles_replay(spark, sf_dir):
    """Gains/lift replayed by brute-force sort in Python; decile 10's
    gain must be exactly 1e6 (all positives captured) and lift_ppm must
    end at ~1e6 (whole population = base rate)."""
    out = {r.decile: r
           for r in evalops.score_lift_gain_deciles(spark, sf_dir).collect()}
    urgent = {o["o_custkey"] for o in _orders(sf_dir)
              if o["o_orderpriority"] == "1-URGENT"}
    lab = sorted(((_cents(c["c_acctbal"]), c["c_custkey"],
                   c["c_custkey"] in urgent) for c in _customers(sf_dir)),
                 key=lambda r: (-r[0], r[1]))
    n, p = len(lab), sum(1 for r in lab if r[2])
    q, rmd = divmod(n, 10)
    sizes = [q + 1 if d <= rmd else q for d in range(1, 11)]  # NTILE
    pos_per, i = [], 0
    for sz in sizes:
        pos_per.append(sum(1 for r in lab[i:i + sz] if r[2]))
        i += sz
    cum_r = cum_p = 0
    for d in range(1, 11):
        cum_r += sizes[d - 1]
        cum_p += pos_per[d - 1]
        r = out[d]
        assert (r.n_rows, r.n_pos) == (sizes[d - 1], pos_per[d - 1])
        assert r.gain_ppm == cum_p * 10**6 // p
        assert r.lift_ppm == cum_p * n * 10**6 // (cum_r * p)
    assert out[10].gain_ppm == 10**6
    assert out[10].lift_ppm == 10**6


def test_calibration_bins_partition_population(spark, sf_dir):
    """Bins partition all customers; per-bin rates replayed exactly;
    base rate identical on every row."""
    out = evalops.score_calibration_bins(spark, sf_dir).collect()
    urgent = {o["o_custkey"] for o in _orders(sf_dir)
              if o["o_orderpriority"] == "1-URGENT"}
    scores = [(_cents(c["c_acctbal"]), c["c_custkey"] in urgent)
              for c in _customers(sf_dir)]
    mn, mx = min(s for s, _ in scores), max(s for s, _ in scores)
    bins: dict[int, list[int]] = {}
    for s, p in scores:
        b = (s - mn) * evalops.CALIB_BINS // (mx - mn + 1)
        t = bins.setdefault(b, [0, 0])
        t[0] += 1
        t[1] += int(p)
    assert {r.bin for r in out} == set(bins)
    assert sum(r.n_rows for r in out) == len(scores)
    base = sum(p for _, p in bins.values()) * 10**6 // len(scores)
    for r in out:
        nr, np_ = bins[r.bin]
        assert (r.n_rows, r.n_pos) == (nr, np_)
        assert r.pos_rate_ppm == np_ * 10**6 // nr
        assert r.base_rate_ppm == base


def test_js_divergence_bounds_and_identity(spark):
    """JSD(p, p) = 0; disjoint vocabularies give exactly ln(2) micros;
    and every pair lands in [0, ln2]."""
    docs = spark.createDataFrame(
        [(1, "a b c a", "en", "s1", 7), (2, "a b c a", "en", "s2", 7),
         (3, "x y z", "en", "s3", 5)],
        "doc_id long, text string, lang string, source string, n_chars long")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {(r.source_a, r.source_b): r
               for r in evalops.source_js_divergence(spark, td).collect()}
    assert out[("s1", "s2")].jsd_micronats == 0
    assert out[("s1", "s2")].shared_terms == 3
    # disjoint: zero shared vocabulary -> pair still present (spine is
    # the source cross join, r8 ADVICE) at exactly the ln(2) extreme
    assert out[("s1", "s3")].shared_terms == 0
    assert out[("s1", "s3")].jsd_micronats == 693147
    assert out[("s2", "s3")].jsd_micronats == 693147
    # bounds on the real corpus pairs
    real = evalops.source_js_divergence(
        spark, "/root/testdata/sf0.001").collect()
    assert all(0 <= r.jsd_micronats <= 693148 for r in real)
    assert len(real) == 190  # C(20,2) source pairs all share some term


def test_fano_matches_python(spark, sf_dir):
    """Fano/burstiness replayed from raw daily counts; a Poisson-ish
    process has fano near its sample value, and B in [-1, 1)."""
    out = {r.event_type: r
           for r in evalops.daily_burstiness_fano(spark, sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "ts"]).to_pylist()
    daily: dict[tuple, int] = {}
    for e in ev:
        daily[(e["event_type"], e["ts"].date())] = daily.get(
            (e["event_type"], e["ts"].date()), 0) + 1
    per: dict[str, list[int]] = {}
    for (t, _), x in daily.items():
        per.setdefault(t, []).append(x)
    assert set(out) == set(per)
    for t, xs in per.items():
        n, s, ssq = len(xs), sum(xs), sum(x * x for x in xs)
        num = n * ssq - s * s
        r = out[t]
        assert (r.n_days, r.n_events) == (n, s)
        assert r.fano_r6 == pytest.approx(round(num / (n * s), 6), abs=1e-9)
        want_b = round((math.sqrt(num) - s) / (math.sqrt(num) + s), 6)
        assert r.burstiness_r6 == pytest.approx(want_b, abs=1e-9)
        assert -1.0 <= r.burstiness_r6 < 1.0


def test_hhi_replay_and_bounds(spark, sf_dir):
    """HHI replayed per nation; bounds: 1e6/n <= HHI_ppm <= 1e6 and
    effective_customers <= n_customers."""
    out = {r.nation: r
           for r in evalops.nation_revenue_hhi(spark, sf_dir).collect()}
    nat = {c["c_custkey"]: c["c_nationkey"] for c in _customers(sf_dir)}
    nname = {n["n_nationkey"]: n["n_name"] for n in pq.read_table(
        f"{sf_dir}/nation.parquet").to_pylist()}
    per: dict[int, int] = {k: 0 for k in nat}
    for o in _orders(sf_dir):
        per[o["o_custkey"]] += _cents(o["o_totalprice"])
    by_nation: dict[str, list[int]] = {}
    for ck, cents in per.items():
        by_nation.setdefault(nname[nat[ck]], []).append(cents)
    for nn, xs in by_nation.items():
        tot, ssq = sum(xs), sum(x * x for x in xs)
        if tot == 0:
            assert nn not in out
            continue
        r = out[nn]
        assert r.n_customers == len(xs)
        assert r.tot_cents == tot
        assert r.hhi_ppm == ssq * 10**6 // (tot * tot)
        assert r.effective_customers_x1000 == tot * tot * 1000 // ssq
        assert r.top_share_ppm == max(xs) * 10**6 // tot
        assert 10**6 // len(xs) <= r.hhi_ppm <= 10**6
        assert r.effective_customers_x1000 <= len(xs) * 1000


def test_threshold_sweep_replay(spark, sf_dir):
    """P/R/F1 replayed per threshold; recall must be monotone
    non-increasing in the threshold and hit 1e6 at the lowest bin."""
    out = {r.threshold_bin: r
           for r in evalops.threshold_sweep_pr_f1(spark, sf_dir).collect()}
    urgent = {o["o_custkey"] for o in _orders(sf_dir)
              if o["o_orderpriority"] == "1-URGENT"}
    scores = [(_cents(c["c_acctbal"]), c["c_custkey"] in urgent)
              for c in _customers(sf_dir)]
    mn, mx = min(s for s, _ in scores), max(s for s, _ in scores)
    p_all = sum(1 for _, p in scores if p)
    binned = [((s - mn) * evalops.CALIB_BINS // (mx - mn + 1), p)
              for s, p in scores]
    for t, r in out.items():
        pred = [(b, p) for b, p in binned if b >= t]
        tp = sum(1 for _, p in pred if p)
        assert (r.pred_pos, r.tp) == (len(pred), tp)
        assert r.precision_ppm == tp * 10**6 // len(pred)
        assert r.recall_ppm == tp * 10**6 // p_all
        assert r.f1_ppm == 2 * tp * 10**6 // (
            2 * tp + (len(pred) - tp) + (p_all - tp))
    lowest = min(out)
    assert out[lowest].recall_ppm == 10**6  # threshold at floor = predict all
    recalls = [out[t].recall_ppm for t in sorted(out)]
    assert recalls == sorted(recalls, reverse=True)


def test_mutual_info_replay_and_bounds(spark, sf_dir):
    """MI replayed cell-by-cell with the same 6dp-ln micros idiom;
    0 <= MI <= min(H_x, H_y) and NMI in [0, 1e6]."""
    got = evalops.segment_priority_mutual_info(spark, sf_dir).collect()[0]
    seg_c = {c["c_custkey"]: c["c_mktsegment"] for c in _customers(sf_dir)}
    cells: dict[tuple, int] = {}
    for o in _orders(sf_dir):
        k = (seg_c[o["o_custkey"]], o["o_orderpriority"])
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for (x, y), c in cells.items():
        rows[x] = rows.get(x, 0) + c
        cols[y] = cols.get(y, 0) + c
    s_mi = sum(c * math.floor(round(math.log((c * n) / (rows[x] * cols[y])),
                                    6) * 1e6 + 0.5)
               for (x, y), c in cells.items())
    assert got.n_orders == n
    assert got.mi_micronats == s_mi // n

    def ent(marg):
        return sum(v * math.floor(round(math.log(n / v), 6) * 1e6 + 0.5)
                   for v in marg.values()) // n
    assert (got.h_seg, got.h_pri) == (ent(rows), ent(cols))
    assert 0 <= got.mi_micronats <= min(got.h_seg, got.h_pri)
    assert got.nmi_ppm == got.mi_micronats * 10**6 // min(got.h_seg,
                                                          got.h_pri)
    assert 0 <= got.nmi_ppm <= 10**6


def test_kappa_replay(spark, sf_dir):
    """Kappa replayed exactly; identity: kappa=1 iff perfect agreement,
    and po > pe implies kappa > 0."""
    got = evalops.classifier_agreement_kappa(spark, sf_dir).collect()[0]
    cust = _customers(sf_dir)
    cents = {c["c_custkey"]: _cents(c["c_acctbal"]) for c in cust}
    mu = sum(cents.values()) // len(cents)
    urgent = {o["o_custkey"] for o in _orders(sf_dir)
              if o["o_orderpriority"] == "1-URGENT"}
    n = len(cust)
    a1 = sum(1 for v in cents.values() if v > mu)
    b1 = sum(1 for k in cents if k in urgent)
    agree = sum(1 for k, v in cents.items()
                if (v > mu) == (k in urgent))
    assert (got.n_customers, got.n_pos_a, got.n_pos_b,
            got.n_agree) == (n, a1, b1, agree)
    assert got.po_ppm == agree * 10**6 // n
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    assert got.pe_ppm == pe_num * 10**6 // (n * n)
    assert got.kappa_ppm == ((agree * n - pe_num) * 10**6
                             // (n * n - pe_num))


def test_isotonic_is_monotone_and_pav_equal(spark, sf_dir):
    """The minimax output must (a) be monotone non-decreasing in bin,
    (b) equal the classic sequential PAV run on the same floored-ppm
    spec, (c) preserve the weighted mean of the raw rates."""
    out = sorted(evalops.isotonic_calibration_bins(spark, sf_dir).collect(),
                 key=lambda r: r.bin)
    rates = [r.iso_rate_ppm for r in out]
    assert rates == sorted(rates)
    # minimax replay (same spec: floored ppm interval means)
    n = [r.n_rows for r in out]
    p = [r.n_pos for r in out]
    m = len(out)

    def mean(j, k):
        return sum(p[j:k + 1]) * 10**6 // sum(n[j:k + 1])
    for i, r in enumerate(out):
        want = max(min(mean(j, k) for k in range(i, m))
                   for j in range(0, i + 1))
        assert r.iso_rate_ppm == want
        assert r.raw_rate_ppm == p[i] * 10**6 // n[i]
    # violation actually existed OR raw was already monotone
    raw = [r.raw_rate_ppm for r in out]
    if raw == sorted(raw):
        assert rates == raw


def test_ccf_replay_and_symmetry(spark, sf_dir):
    """CCF replayed from raw daily counts at every lag; |r| <= 1 and
    the pair counts shrink by |lag|."""
    out = {r.lag: r for r in evalops.purchase_view_ccf(spark,
                                                       sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "ts"]).to_pylist()
    daily: dict = {}
    for e in ev:
        if e["event_type"] in ("view", "purchase"):
            d = daily.setdefault(e["ts"].date(), [0, 0])
            d[0 if e["event_type"] == "view" else 1] += 1
    days = sorted(daily)
    idx = {d: i for i, d in enumerate(days)}
    import datetime
    for lag in range(-evalops.CCF_MAX_LAG, evalops.CCF_MAX_LAG + 1):
        pairs = [(daily[d][0], daily[d2][1]) for d in days
                 if (d2 := d + datetime.timedelta(days=lag)) in idx]
        np_ = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        want = round((np_ * sxy - sx * sy)
                     / math.sqrt(float(np_ * sxx - sx * sx)
                                 * float(np_ * syy - sy * sy)), 6)
        r = out[lag]
        assert r.n_pairs == np_
        assert r.ccf_r6 == pytest.approx(want, abs=1e-9)
        assert abs(r.ccf_r6) <= 1.0


def test_ndcg_replay_and_bounds(spark, sf_dir):
    """NDCG replayed with the same integer discounts; bounds: 0 <
    ndcg <= 1e6, and IDCG >= DCG always."""
    got = evalops.ndcg_retrieval_eval(spark, sf_dir).collect()[0]
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    grades = {}
    for d in docs:
        toks = set(d["text"].lower().strip().split())
        g = len(toks & set(evalops.NDCG_TERMS))
        if g:
            grades[d["doc_id"]] = 2 ** g - 1
    assert got.n_judged == len(grades)
    ideal = sorted(grades.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    idcg = sum(g * evalops.NDCG_DISC[i]
               for i, (_, g) in enumerate(ideal, start=1))
    assert got.idcg_micro == idcg
    assert 0 < got.dcg_micro <= got.idcg_micro
    assert got.ndcg10_ppm == got.dcg_micro * 10**6 // got.idcg_micro
    assert 0 < got.ndcg10_ppm <= 10**6


def test_walk_forward_folds_are_leak_free(spark, sf_dir):
    """Each fold's train window must end strictly before its test
    window; folds expand monotonically; test windows tile the tail
    with no overlap; counts replayed from raw months."""
    out = sorted(evalops.walk_forward_cv_splits(spark, sf_dir).collect(),
                 key=lambda r: r.fold)
    assert [r.fold for r in out] == list(range(1, evalops.CV_FOLDS + 1))
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate"]).to_pylist()
    per_month: dict[str, int] = {}
    for o in orders:
        per_month[o["o_orderdate"].strftime("%Y-%m")] = per_month.get(
            o["o_orderdate"].strftime("%Y-%m"), 0) + 1
    months = sorted(per_month)
    for r in out:
        assert r.train_end < r.test_end
        ti = months.index(r.train_end)
        te = months.index(r.test_end)
        assert te - ti == evalops.CV_TEST_MONTHS
        assert r.train_rows == sum(per_month[m] for m in months[:ti + 1])
        assert r.test_rows == sum(per_month[m]
                                  for m in months[ti + 1:te + 1])
    for a, b in zip(out, out[1:]):
        assert b.train_end > a.train_end
        assert b.train_end == a.test_end  # tiling: next train absorbs test


def test_laplace_planner_matches_formula(spark, sf_dir):
    """Scale/CI replayed with the 6dp ladder; wider epsilon -> tighter
    CI; relative error is ppm of the true count."""
    out = {r.epsilon: r
           for r in evalops.laplace_noise_planner(spark, sf_dir).collect()}
    n = len(pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"]).to_pylist())
    for eps_s in evalops.DP_EPSILONS:
        r = out[eps_s]
        b = round(1.0 / float(eps_s), 6)
        ci = round(b * evalops._LN20_R6, 6)
        assert r.n_rows == n
        assert r.scale_b_r6 == pytest.approx(b, abs=1e-12)
        assert r.ci95_half_r6 == pytest.approx(ci, abs=1e-12)
        assert r.rel_ci95_ppm == math.floor(ci * 1e6 + 0.5) * 10**6 // n
    cis = [out[e].ci95_half_r6 for e in sorted(out, key=float)]
    assert cis == sorted(cis, reverse=True)


def test_pinball_replay_and_median_dominance(spark, sf_dir):
    """Pinball losses replayed from raw monthly cents; identity: for a
    point forecast the q=0.5 loss is half the MAE, so
    2 * mean(q=.5 total) == mean(|y-f|) * 1e6 (exactly, in totals)."""
    out = {r.q_ppm: r
           for r in evalops.forecast_pinball_eval(spark, sf_dir).collect()}
    monthly: dict[tuple, int] = {}
    for o in _orders(sf_dir):
        k = (o["o_orderdate"].year, o["o_orderdate"].month)
        monthly[k] = monthly.get(k, 0) + _cents(o["o_totalprice"])
    pairs = [(v, monthly[(y - 1, m)]) for (y, m), v in monthly.items()
             if (y - 1, m) in monthly]
    assert all(r.n_months == len(pairs) for r in out.values())
    for q in evalops.PINBALL_Q_PPM:
        total = sum(q * (y - f) if y >= f else (10**6 - q) * (f - y)
                    for y, f in pairs)
        assert out[q].total_pinball_micro == total
        assert out[q].mean_pinball_micro == total // len(pairs)
    mae_micro = sum(abs(y - f) for y, f in pairs) * 10**6
    assert 2 * out[500000].total_pinball_micro == mae_micro


def test_interarrival_replay(spark, sf_dir):
    """Gap moments replayed per (user, type) sequence; CV and
    burstiness recomputed with the same exact-integer numerator."""
    out = {r.event_type: r
           for r in evalops.interarrival_dispersion(spark,
                                                    sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "event_type", "ts",
                                "event_id"]).to_pylist()
    seqs: dict[tuple, list] = {}
    for e in ev:
        seqs.setdefault((e["user_id"], e["event_type"]), []).append(
            (e["ts"], e["event_id"]))
    gaps: dict[str, list[int]] = {}
    for (_, t), rows in seqs.items():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            us = int((b[0] - a[0]).total_seconds() * 1_000_000)
            gaps.setdefault(t, []).append(us // 1_000_000)
    for t, gs in gaps.items():
        n, s, ssq = len(gs), sum(gs), sum(g * g for g in gs)
        if s == 0:
            assert t not in out
            continue
        num = n * ssq - s * s
        r = out[t]
        assert (r.n_gaps, r.mean_gap_s) == (n, s // n)
        assert r.cv_r6 == pytest.approx(round(math.sqrt(num) / s, 6),
                                        abs=1e-9)
        assert r.burstiness_r6 == pytest.approx(
            round((math.sqrt(num) - s) / (math.sqrt(num) + s), 6),
            abs=1e-9)


def test_path_entropy_replay_and_weighted_mean(spark, sf_dir):
    """Per-from entropies replayed from raw transitions; the overall
    row must equal the transition-weighted mean by construction."""
    out = {r.from_type: r
           for r in evalops.path_conditional_entropy(spark,
                                                     sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "event_type", "ts",
                                "event_id"]).to_pylist()
    seqs: dict[int, list] = {}
    for e in ev:
        seqs.setdefault(e["user_id"], []).append(
            (e["ts"], e["event_id"], e["event_type"]))
    cells: dict[tuple, int] = {}
    for rows in seqs.values():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            cells[(a[2], b[2])] = cells.get((a[2], b[2]), 0) + 1
    rown: dict[str, int] = {}
    for (f_, _), c in cells.items():
        rown[f_] = rown.get(f_, 0) + c
    micros: dict[str, int] = {}
    for (f_, _), c in cells.items():
        micros[f_] = micros.get(f_, 0) + c * math.floor(
            round(math.log(rown[f_] / c), 6) * 1e6 + 0.5)
    for f_, n in rown.items():
        r = out[f_]
        assert (r.n_transitions,
                r.cond_entropy_micronats) == (n, micros[f_] // n)
    ov = out["__overall__"]
    assert ov.n_transitions == sum(rown.values())
    assert ov.cond_entropy_micronats == (
        sum(micros.values()) // sum(rown.values()))


def test_pvm_decomposition_reconciles(spark, sf_dir):
    """volume + price_mix + residual must equal the revenue delta on
    EVERY row (the ledger reconciliation the residual column exists
    for), and the residual stays below one average ticket."""
    out = evalops.price_volume_mix_decomposition(spark, sf_dir).collect()
    assert out
    for r in out:
        assert (r.volume_effect_cents + r.price_mix_effect_cents
                + r.rounding_residual_cents) == r.rev_delta_cents
        assert abs(r.rounding_residual_cents) <= max(
            1, abs(r.rev_delta_cents) + 1)
    # there are 5 segments and TPC-H spans years 1992-1998 -> rows
    assert len({r.segment for r in out}) == 5


def test_qq_drift_replay(spark, sf_dir):
    """Decile pairs replayed with numpy's linear (type-7) quantile on
    the doubled-cents arrays — the same interpolation definition both
    engines implement."""
    import numpy as np

    out = {r.q_ppm: r
           for r in evalops.order_price_qq_drift(spark, sf_dir).collect()}
    a, b = [], []
    for o in _orders(sf_dir):
        c2 = _cents(o["o_totalprice"]) * 2
        (a if o["o_orderkey"] % 2 == 0 else b).append(c2)
    for d in evalops.QQ_DECILES:
        pa = math.floor(np.quantile(np.array(a, dtype=np.float64), d / 10,
                                    method="linear"))
        pb = math.floor(np.quantile(np.array(b, dtype=np.float64), d / 10,
                                    method="linear"))
        r = out[d * 100000]
        assert (r.p_first_x2, r.p_second_x2) == (pa, pb)
        # both engines truncate integer division toward ZERO (Python
        # floors toward -inf) — emulate the engines' semantics
        num = (pb - pa) * 10**6
        want = num // pa if num >= 0 else -((-num) // pa)
        assert r.shift_ppm == want
    # deciles are monotone within each cohort
    firsts = [out[d * 100000].p_first_x2 for d in evalops.QQ_DECILES]
    assert firsts == sorted(firsts)
