"""Golden tests for the r6 statistical operators: planted inputs with
numpy as ground truth (the oracle-parity suite proves cross-engine
equality; these prove the STATISTIC itself is the textbook quantity)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from telescope_data_pipeline_spark.queries import get

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=COLS)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet", coerce_timestamps="us")
    return str(tmp_path)


def test_ks_drift_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 1.0, 400)   # cohort user_id=0 (even)
    b = rng.normal(0.6, 1.3, 300)   # cohort user_id=1 (odd)
    rows = [(i, "2026-01-01", 0, "t", float(v), None)
            for i, v in enumerate(a)]
    rows += [(1000 + i, "2026-01-01", 1, "t", float(v), None)
             for i, v in enumerate(b)]
    sf = _write_events(tmp_path, rows)
    out = get("q_ks_drift").fn(spark, sf).collect()[0]
    # numpy two-sample KS: sup over pooled points of |F_a - F_b|
    pooled = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    want = np.max(np.abs(fa - fb))
    assert out.n_a == 400 and out.n_b == 300
    assert abs(out.ks_d - round(want, 6)) < 1e-9
    # identical cohorts => D == 0
    rows_eq = [(i, "2026-01-01", i // 100, "t", float(a[i % 100]), None)
               for i in range(200)]  # same 100 values in each cohort
    out0 = get("q_ks_drift").fn(spark, _write_events(tmp_path, rows_eq)).collect()[0]
    assert out0.ks_d == 0.0


def test_ab_ttest_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(11)
    a = rng.normal(5.0, 2.0, 250)
    b = rng.normal(4.4, 1.1, 180)
    rows = [(i, "2026-01-01", 0, "t", float(v), None) for i, v in enumerate(a)]
    rows += [(900 + i, "2026-01-01", 1, "t", float(v), None)
             for i, v in enumerate(b)]
    out = get("q_ab_ttest").fn(spark, _write_events(tmp_path, rows)).collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                     + (vb / len(b)) ** 2 / (len(b) - 1))
    assert abs(out.t_stat - round(t, 6)) < 1e-9
    assert abs(out.df - round(df, 6)) < 1e-9


def test_winsorize_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(3)
    v = np.concatenate([rng.normal(10, 1, 500), [1000.0, -1000.0]])
    rows = [(i, "2026-01-01", i, "t", float(x), None) for i, x in enumerate(v)]
    out = get("q_winsorize").fn(spark, _write_events(tmp_path, rows)).collect()[0]
    lo, hi = np.percentile(v, [5, 95])  # linear interpolation, same as Spark
    clipped = np.clip(v, lo, hi)
    assert abs(out.wins_mean - round(clipped.mean(), 6)) < 1e-6
    assert out.n_clip_lo == int((v < lo).sum())
    assert out.n_clip_hi == int((v > hi).sum())
    assert out.n == len(v)


def test_interp_linear_recovers_linear_series(spark, tmp_path):
    # user 0: y = 2*dayindex on days 0,1,4,9 -> interior gaps must
    # interpolate EXACTLY back onto the line; edges extend.
    days = [0, 1, 4, 9]
    rows = [(i, f"2026-02-{d + 1:02d}", 0, "t", float(2 * d), None)
            for i, d in enumerate(days)]
    out = (get("q_interp_linear").fn(spark, _write_events(tmp_path, rows))
           .toPandas().sort_values("day").reset_index(drop=True))
    assert len(out) == 10
    for i, r in out.iterrows():
        assert abs(r.interp - 2.0 * i) < 1e-9, (i, r.interp)
    observed = out.day_avg.notna().sum()
    assert observed == 4


# ---------------------------------------------------------------------------
# Round-12 session-3 diagnostics: numpy is ground truth (the oracle
# mirrors the engine's formula, so cross-engine parity alone cannot
# catch a shared formula error — these pin the textbook quantity).
# ---------------------------------------------------------------------------


def test_ljung_box_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(19)
    # AR(1)-ish series, values exact at 1e-4 so micro-quantization is
    # lossless; single event_type, ts constant -> event_id orders rows
    x = np.zeros(500)
    for t in range(1, 500):
        x[t] = 0.55 * x[t - 1] + rng.normal()
    x = np.round(x, 4)
    rows = [(i, "2026-01-01", 1, "ar", float(v), None)
            for i, v in enumerate(x)]
    out = get("q_ljung_box").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    n = len(x)
    d = x - x.mean()
    den = (d * d).sum()
    r = [float((d[k:] * d[:-k]).sum() / den) for k in (1, 2, 3)]
    q3 = n * (n + 2.0) * sum(rk * rk / (n - k)
                             for k, rk in zip((1, 2, 3), r))
    assert out.n == n
    assert abs(out.lb_q3 - q3) < 1e-3 * max(1.0, abs(q3))
    assert out.reject_95 == bool(q3 > 7.814728)
    # white noise twin: Q should be far below the AR series' Q
    w = np.round(rng.normal(size=500), 4)
    rows_w = [(i, "2026-01-01", 1, "wn", float(v), None)
              for i, v in enumerate(w)]
    out_w = get("q_ljung_box").fn(
        spark, _write_events(tmp_path, rows_w)).collect()[0]
    assert out_w.lb_q3 < out.lb_q3 / 10


def test_granger_matches_numpy_lstsq(spark, tmp_path):
    rng = np.random.RandomState(23)
    n_days = 90
    x = np.round(rng.uniform(100, 200, n_days), 2)        # ordered
    y = np.zeros(n_days)
    for t in range(1, n_days):
        y[t] = 0.4 * y[t - 1] + 0.8 * x[t - 1] + rng.normal(0, 5)
    y = np.round(np.abs(y) + 1, 2)                         # shipped
    days = pd.date_range("2026-01-01", periods=n_days, freq="D")
    pd.DataFrame({
        "o_orderdate": days.strftime("%Y-%m-%d"),
        "o_totalprice": x,
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        "l_shipdate": days.strftime("%Y-%m-%d"),
        "l_extendedprice": y,
    }).to_parquet(tmp_path / "lineitem.parquet")
    out = get("q_granger").fn(spark, str(tmp_path)).collect()[0]

    def f_stat(dep, lag_own, lag_other):
        a = np.column_stack([np.ones(len(dep)), lag_own, lag_other])
        rss_u = float(np.linalg.lstsq(a, dep, rcond=None)[1][0])
        b = np.column_stack([np.ones(len(dep)), lag_own])
        res_r = dep - b @ np.linalg.lstsq(b, dep, rcond=None)[0]
        rss_r = float((res_r ** 2).sum())
        return (rss_r - rss_u) * (len(dep) - 3) / rss_u

    dep_y, own_y, oth_y = y[1:], y[:-1], x[:-1]
    dep_x, own_x, oth_x = x[1:], x[:-1], y[:-1]
    f_xy = f_stat(dep_y, own_y, oth_y)   # orders -> shipped
    f_yx = f_stat(dep_x, own_x, oth_x)   # shipped -> orders
    assert out.n_days == n_days - 1
    assert abs(out.f_orders_cause_shipped - f_xy) < 1e-4 * max(1, abs(f_xy))
    assert abs(out.f_shipped_cause_orders - f_yx) < 1e-4 * max(1, abs(f_yx))
    # the planted causality must be detected in the right direction
    assert out.f_orders_cause_shipped > 50 > out.f_shipped_cause_orders


def test_tcloseness_matches_direct_emd(spark, tmp_path):
    rng = np.random.RandomState(29)
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    # two classes with very different sensitive mixes + a balanced one
    cust = pd.DataFrame({
        "c_custkey": range(300),
        "c_nationkey": [i % 3 for i in range(300)],
        "c_mktsegment": ["SEG"] * 300,
    })
    pr_idx = []
    for i in range(300):
        if i % 3 == 0:
            pr_idx.append(0)                      # all urgent
        elif i % 3 == 1:
            pr_idx.append(4)                      # all low
        else:
            pr_idx.append(int(rng.randint(0, 5)))  # mixed
    orders = pd.DataFrame({
        "o_custkey": range(300),
        "o_orderpriority": [pris[j] for j in pr_idx],
    })
    cust.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    out = {(r.c_nationkey, r.c_mktsegment): r for r in
           get("q_tcloseness").fn(spark, str(tmp_path)).collect()}
    counts = np.zeros((3, 5))
    for i, j in enumerate(pr_idx):
        counts[i % 3, j] += 1
    glob = counts.sum(axis=0)
    for c in range(3):
        p = np.cumsum(counts[c] / counts[c].sum())
        q = np.cumsum(glob / glob.sum())
        want = float(np.abs(p - q).sum() / 4.0)
        got = out[(c, "SEG")]
        assert abs(got.t_emd - want) < 2e-6, c
        assert got.breach_02 == bool(want > 0.2), c
    # the skewed classes must breach, the mixed one must not
    assert out[(0, "SEG")].breach_02 and out[(1, "SEG")].breach_02
    assert not out[(2, "SEG")].breach_02


def test_kde_curve_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(31)
    v = np.round(np.concatenate([rng.normal(20, 3, 600),
                                 rng.normal(60, 8, 400)]), 4)
    rows = [(i, "2026-01-01", i, "t", float(x), None)
            for i, x in enumerate(v)]
    out = get("q_kde_curve").fn(
        spark, _write_events(tmp_path, rows)).collect()
    mn, mx = v.min(), v.max()
    h = (mx - mn) / 8.0
    grid = mn + (mx - mn) * np.arange(21) / 20.0
    u = (v[None, :] - grid[:, None]) / h
    k = np.where(np.abs(v[None, :] - grid[:, None]) < h,
                 0.9375 * (1 - u * u) ** 2, 0.0)
    want = k.sum(axis=1) / (len(v) * h)
    assert len(out) == 21
    for r in out:
        assert abs(r.density - want[r.grid_i]) < 2e-6, r.grid_i
    # densities integrate to ~1 over the grid (sanity of the estimate)
    width = (mx - mn) / 20.0
    assert abs(sum(r.density for r in out) * width - 1.0) < 0.08


def test_knn_outlier_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(37)
    base = rng.normal(0, 1, (120, 16)).astype(np.float32)
    base[:100] /= 4.0            # a dense core...
    base[100:] *= 3.0            # ...and 20 scattered outliers
    pd.DataFrame({
        "vec_id": range(120),
        "embedding": [r for r in base],
        "label": [0] * 120,
    }).to_parquet(tmp_path / "embeddings.parquet")
    out = get("q_knn_outlier").fn(spark, str(tmp_path)).collect()
    x = base.astype(np.float64)
    nrm = np.linalg.norm(x, axis=1)
    cos = (x @ x.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    cos9 = np.round(cos, 9)
    third = np.sort(cos9, axis=1)[:, -3]     # 3rd highest cosine
    score = np.round(1 - third, 6)
    order = np.lexsort((np.arange(120), -score))[:20]
    want = {int(i): float(score[i]) for i in order}
    got = {r.vec_id: r.knn3_dist for r in out}
    assert got == want


def test_atkinson_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(41)
    lens = rng.lognormal(6, 1, 400).astype(int) + 1
    pd.DataFrame({
        "doc_id": range(400),
        "text": ["x"] * 400,
        "lang": ["en"] * 400,
        "source": ["s"] * 400,
        "n_chars": lens,
    }).to_parquet(tmp_path / "documents.parquet")
    out = get("q_atkinson").fn(spark, str(tmp_path)).collect()[0]
    mean = lens.mean()
    a1 = 1 - np.exp(np.log(lens).mean()) / mean
    a2 = 1 - (len(lens) / (1.0 / lens).sum()) / mean
    assert out.n_docs == 400
    assert abs(out.atkinson_1 - a1) < 1e-5
    assert abs(out.atkinson_2 - a2) < 1e-5


# ---------------------------------------------------------------------------
# Ground-truth extension to the r10-r12 statistics batches: the same
# oracle-mirrors-the-formula gap the session-3 tests close — planted
# inputs, numpy as the textbook reference.
# ---------------------------------------------------------------------------


def _write_orders_prio(tmp_path, rng, sizes=(80, 110, 95, 130, 60)):
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    grp, val = [], []
    for p, n, shift in zip(pris, sizes, (0, 8, -5, 15, 3)):
        grp += [p] * n
        val += list(np.round(rng.normal(100 + shift, 20, n), 2))
    pd.DataFrame({"o_orderpriority": grp, "o_totalprice": val}
                 ).to_parquet(tmp_path / "orders.parquet")
    return np.array(grp), np.array(val)


def test_anova_and_tukey_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(47)
    grp, val = _write_orders_prio(tmp_path, rng)
    out = get("q_anova_oneway").fn(spark, str(tmp_path)).collect()[0]
    groups = [val[grp == g] for g in np.unique(grp)]
    n, k = len(val), len(groups)
    ssb = sum(len(g) * (g.mean() - val.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out.k == k and out.n == n
    assert abs(out.f_stat - f) < 1e-4 * max(1, abs(f))
    assert abs(out.eta_sq - ssb / (ssb + ssw)) < 1e-5

    rows = get("q_tukey_contrasts").fn(spark, str(tmp_path)).collect()
    assert len(rows) == k * (k - 1) // 2
    msw = ssw / (n - k)
    means = {g: val[grp == g].mean() for g in np.unique(grp)}
    sizes = {g: (grp == g).sum() for g in np.unique(grp)}
    for r in rows:
        diff = means[r.grp_b] - means[r.grp_a]
        se = np.sqrt(msw * (1 / sizes[r.grp_a] + 1 / sizes[r.grp_b]))
        q = abs(diff) / np.sqrt(msw / 2 * (1 / sizes[r.grp_a]
                                           + 1 / sizes[r.grp_b]))
        assert abs(r.mean_diff - diff) < 1e-4, (r.grp_a, r.grp_b)
        assert abs(r.se - se) < 1e-4
        assert abs(r.q_stat - q) < 1e-3 * max(1, q)


def test_mood_median_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(53)
    grp, val = _write_orders_prio(tmp_path, rng)
    out = {r.grp: r for r in
           get("q_mood_median").fn(spark, str(tmp_path)).collect()}
    xc = np.round(val * 100).astype(np.int64)
    # lower median: smallest value whose cumulative count reaches
    # ceil(N/2), i.e. 2*cum >= N
    xs = np.sort(xc)
    med = xs[np.searchsorted(2 * (np.arange(len(xs)) + 1),
                             len(xs), side="left")]
    above = {g: int((xc[grp == g] > med).sum()) for g in np.unique(grp)}
    below = {g: int((xc[grp == g] <= med).sum()) for g in np.unique(grp)}
    ta, tb = sum(above.values()), sum(below.values())
    ntot = ta + tb
    chi2 = sum(((above[g] - (above[g] + below[g]) * ta / ntot) ** 2
                / ((above[g] + below[g]) * ta / ntot))
               + ((below[g] - (above[g] + below[g]) * tb / ntot) ** 2
                  / ((above[g] + below[g]) * tb / ntot))
               for g in np.unique(grp))
    for g in np.unique(grp):
        assert out[g].n_above == above[g], g
        assert out[g].n_below == below[g], g
    assert abs(next(iter(out.values())).chi2 - chi2) < 1e-4


def test_icc_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(59)
    rows, uid = [], 0
    vals_by_user = []
    for u in range(40):
        m = rng.normal(50, 10)           # between-user variance
        nn = rng.randint(3, 9)
        v = np.round(m + rng.normal(0, 4, nn), 2)
        vals_by_user.append(v)
        rows += [(uid + i, "2026-01-01", u, "t", float(x), None)
                 for i, x in enumerate(v)]
        uid += nn
    out = get("q_icc").fn(spark, _write_events(tmp_path, rows)).collect()[0]
    allv = np.concatenate(vals_by_user)
    n, k = len(allv), len(vals_by_user)
    ssb = sum(len(v) * (v.mean() - allv.mean()) ** 2 for v in vals_by_user)
    ssw = sum(((v - v.mean()) ** 2).sum() for v in vals_by_user)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    k0 = (n - sum(len(v) ** 2 for v in vals_by_user) / n) / (k - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert out.n_groups == k and out.n == n
    assert abs(out.k0 - k0) < 1e-5
    # icc1 carries the deliberate 1e4-centi^2 sbq quantization (sized
    # for exactness at sf1000 overflow bounds), so tolerance is looser
    assert abs(out.icc1 - icc) < 5e-4


def test_kruskal_wallis_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(61)
    # one stream, 4 cohorts by user_id % 4, deliberate ties (1dp grid)
    rows = []
    for i in range(600):
        rows.append((i, "2026-01-01", i, "t",
                     float(np.round(rng.normal(10 + (i % 4), 2), 1)),
                     None))
    out = get("q_kruskal_wallis").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    v = np.array([r[4] for r in rows])
    g = np.array([r[2] % 4 for r in rows])
    order = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    rank_term = sum(order[g == c].sum() ** 2 / (g == c).sum()
                    for c in range(4))
    h = 12.0 / (n * (n + 1)) * rank_term - 3 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    h /= 1 - (counts ** 3 - counts).sum() / (n ** 3 - n)
    assert out.n == n
    assert abs(out.h_stat - h) < 1e-4 * max(1, abs(h))


def test_jarque_bera_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(67)
    v = np.round(rng.lognormal(3, 0.4, 800), 2)   # skewed on purpose
    rows = [(i, "2026-01-01", i, "t", float(x), None)
            for i, x in enumerate(v)]
    out = get("q_jarque_bera").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    d = v - v.mean()
    m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
    skew = m3 / m2 ** 1.5
    kurt = m4 / m2 ** 2 - 3
    jb = len(v) / 6 * (skew ** 2 + kurt ** 2 / 4)
    assert abs(out.skewness - skew) < 1e-5
    assert abs(out.excess_kurtosis - kurt) < 1e-5
    assert abs(out.jarque_bera - jb) < 1e-3 * max(1, jb)


def test_emd_drift_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(71)
    ref = np.round(rng.normal(20, 5, 500), 3)
    cur = np.round(rng.normal(26, 7, 400), 3)     # planted drift
    rows = [(i, "2024-01-%02d" % (1 + i % 14), i, "t", float(x), None)
            for i, x in enumerate(ref)]
    rows += [(10_000 + i, "2024-01-%02d" % (17 + i % 14), i, "t",
              float(x), None) for i, x in enumerate(cur)]
    out = get("q_emd_drift").fn(
        spark, _write_events(tmp_path, rows)).collect()
    allv = np.concatenate([ref, cur])
    mn, mx = allv.min(), allv.max()
    bins = np.clip(np.floor((allv - mn) * 20 / (mx - mn)), 0, 19)
    cr = np.bincount(bins[:len(ref)].astype(int), minlength=20)
    cc = np.bincount(bins[len(ref):].astype(int), minlength=20)
    gap = np.abs(np.cumsum(cr) / cr.sum() - np.cumsum(cc) / cc.sum())
    want_total = gap.sum() * (mx - mn) / 20
    assert len(out) == 20
    got = {r.bin: r for r in out}
    for b in range(20):
        assert got[b].n_ref == cr[b] and got[b].n_cur == cc[b], b
    assert abs(out[0].emd_total - want_total) < 1e-4
    assert out[0].emd_total > 1.0   # the planted drift is visible


def test_theil_and_gini_by_group_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(73)
    lens, langs = [], []
    for lang, mu in (("en", 7.0), ("de", 6.0)):
        x = (rng.lognormal(mu, 0.9, 150).astype(int) + 1)
        lens += list(x)
        langs += [lang] * 150
    pd.DataFrame({
        "doc_id": range(len(lens)), "text": ["x"] * len(lens),
        "lang": langs, "source": ["s"] * len(lens), "n_chars": lens,
    }).to_parquet(tmp_path / "documents.parquet")
    th = {r.lang: r for r in
          get("q_theil_index").fn(spark, str(tmp_path)).collect()}
    gi = {r.lang: r for r in
          get("q_gini_by_group").fn(spark, str(tmp_path)).collect()}
    arr = {"en": np.array(lens[:150], float),
           "de": np.array(lens[150:], float)}
    for lang, x in arr.items():
        mean = x.mean()
        t = (x * np.log(x)).sum() / x.sum() - np.log(mean)
        mld = np.log(mean) - np.log(x).mean()
        assert abs(th[lang].theil_t - t) < 1e-5, lang
        assert abs(th[lang].mld - mld) < 1e-5, lang
        xs = np.sort(x)
        n = len(xs)
        g = 2 * ((np.arange(1, n + 1) * xs).sum()) / (n * xs.sum()) \
            - (n + 1) / n
        assert abs(gi[lang].gini - g) < 1e-5, lang


def test_ccf_lags_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(79)
    n_days = 120
    x = np.round(rng.uniform(50, 150, n_days), 2)
    y = np.empty(n_days)
    y[:3] = 100.0
    for t in range(3, n_days):
        y[t] = 0.7 * x[t - 3] + rng.normal(0, 3)   # planted lag-3 lead
    y = np.round(y, 2)
    days = pd.date_range("2026-01-01", periods=n_days, freq="D")
    pd.DataFrame({"o_orderdate": days.strftime("%Y-%m-%d"),
                  "o_totalprice": x}).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_shipdate": days.strftime("%Y-%m-%d"),
                  "l_extendedprice": y}).to_parquet(
        tmp_path / "lineitem.parquet")
    out = {r.lag: r for r in
           get("q_ccf_lags").fn(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(15))
    best = None
    for lag in range(15):
        a, b = x[:n_days - lag], y[lag:]
        want = np.corrcoef(a, b)[0, 1]
        assert out[lag].n_days == n_days - lag
        assert abs(out[lag].ccf - want) < 1e-5, lag
        if best is None or out[lag].ccf > out[best].ccf:
            best = lag
    assert best == 3   # the planted lead is recovered


def test_cochran_armitage_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(83)
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    grp, status = [], []
    for s, n in zip(range(1, 6), (120, 90, 150, 80, 110)):
        p = 0.15 + 0.12 * s                 # planted dose-response
        grp += [pris[s - 1]] * n
        status += ["F" if rng.rand() < p else "O" for _ in range(n)]
    pd.DataFrame({"o_orderpriority": grp, "o_orderstatus": status,
                  }).to_parquet(tmp_path / "orders.parquet")
    out = get("q_cochran_armitage").fn(spark, str(tmp_path)).collect()[0]
    s = np.array([int(g[0]) for g in grp], float)
    y = np.array([1.0 if st == "F" else 0.0 for st in status])
    nn, xx = len(y), y.sum()
    p_hat = xx / nn
    z = ((s * y).sum() - (s.sum()) * p_hat) / np.sqrt(
        p_hat * (1 - p_hat) * ((s * s).sum() - s.sum() ** 2 / nn))
    assert out.n == nn and out.n_success == int(xx)
    assert abs(out.z_trend - z) < 1e-5
    assert out.z_trend > 3   # the planted trend is detected


def test_mantel_haenszel_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(89)
    n_cust = 240
    seg = [f"SEG{i % 3}" for i in range(n_cust)]
    bal = [(-50.0 if rng.rand() < 0.4 else 100.0) for _ in range(n_cust)]
    pd.DataFrame({"c_custkey": range(n_cust), "c_mktsegment": seg,
                  "c_acctbal": bal}).to_parquet(tmp_path / "customer.parquet")
    # outcome depends on exposure inside every stratum (planted OR > 1)
    ck, st = [], []
    for c in range(n_cust):
        for _ in range(rng.randint(1, 4)):
            ck.append(c)
            p = 0.55 if bal[c] < 0 else 0.30
            st.append("F" if rng.rand() < p else "O")
    pd.DataFrame({"o_custkey": ck, "o_orderstatus": st}
                 ).to_parquet(tmp_path / "orders.parquet")
    rows = {r.stratum: r for r in
            get("q_mantel_haenszel").fn(spark, str(tmp_path)).collect()}
    num = den = 0.0
    for sidx in range(3):
        a = b = c_ = d = 0
        for k, s in zip(ck, st):
            if seg[k] != f"SEG{sidx}":
                continue
            e, yy = bal[k] < 0, s == "F"
            a += e and yy
            b += e and not yy
            c_ += (not e) and yy
            d += (not e) and (not yy)
        n = a + b + c_ + d
        r = rows[f"SEG{sidx}"]
        assert (r.a, r.b, r.c, r.d) == (a, b, c_, d), sidx
        want_or = (a * d) / (b * c_)
        assert abs(r.or_stratum - want_or) < 1e-4 * max(1, want_or), sidx
        num += a * d / n
        den += b * c_ / n
    or_mh = num / den
    r0 = next(iter(rows.values()))
    assert abs(r0.or_mh - or_mh) < 1e-4 * max(1, or_mh)
    assert r0.or_mh > 1.5   # the planted confounder-adjusted effect


def test_partial_corr_and_goodman_gamma_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(97)
    n = 400
    age = rng.randint(0, 2000, n)
    items = np.clip((age / 400 + rng.poisson(2, n)).astype(int), 1, 8)
    price = np.round(50.0 * items + 0.01 * age + rng.normal(0, 40, n), 2)
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pri = rng.randint(1, 6, n)
    days = (pd.Timestamp("1992-01-01")
            + pd.to_timedelta(age, unit="D")).strftime("%Y-%m-%d")
    pd.DataFrame({"o_orderkey": range(n),
                  "o_totalprice": price,
                  "o_orderdate": days,
                  "o_orderpriority": [pris[p - 1] for p in pri],
                  }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_orderkey": np.repeat(np.arange(n), items)}
                 ).to_parquet(tmp_path / "lineitem.parquet")

    out = get("q_partial_corr").fn(spark, str(tmp_path)).collect()[0]
    x = np.round(price * 100)            # centi, like the engine
    y, z = items.astype(float), age.astype(float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    part = (rxy - rxz * ryz) / np.sqrt((1 - rxz ** 2) * (1 - ryz ** 2))
    assert out.n == n
    assert abs(out.r_xy - rxy) < 1e-5
    assert abs(out.r_xy_given_z - part) < 1e-5
    # controlling for age must shrink the raw correlation toward the
    # item-driven signal, not flip its sign
    assert out.r_xy_given_z > 0

    g = get("q_goodman_gamma").fn(spark, str(tmp_path)).collect()[0]
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dp = pri[i] - pri[j]
            db = items[i] - items[j]     # basket = min(count, 8) = items
            if dp * db > 0:
                conc += 1
            elif dp * db < 0:
                disc += 1
    assert (g.concordant, g.discordant) == (conc, disc)
    assert abs(g.gamma - (conc - disc) / (conc + disc)) < 1e-5


def test_wilcoxon_signed_rank_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(101)
    rows, diffs = [], []
    for u in range(80):
        pre = float(rng.randint(80, 120))      # integer values: exact
        post = float(pre + rng.randint(-15, 25))  # centi means, no .5s
        rows.append((2 * u, "2024-01-10", u, "t", pre, None))
        rows.append((2 * u + 1, "2024-01-20", u, "t", post, None))
        if post != pre:
            diffs.append((post - pre) * 100)
    out = get("q_wilcoxon_signed_rank").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    d = np.array(diffs)
    ranks = pd.Series(np.abs(d)).rank(method="average").to_numpy()
    w_plus = ranks[d > 0].sum()
    n = len(d)
    _, counts = np.unique(np.abs(d), return_counts=True)
    var = n * (n + 1) * (2 * n + 1) / 24 - (counts ** 3 - counts).sum() / 48
    z = (w_plus - n * (n + 1) / 4) / np.sqrt(var)
    assert out.n_pairs == n
    assert abs(out.w_plus - w_plus) < 0.11
    assert abs(out.z - z) < 1e-5


def test_friedman_and_cochran_q_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(103)
    streams = ["a", "b", "c", "d"]
    rows, eid = [], 0
    mus = {}
    for day in range(1, 26):                    # 25 complete blocks
        for si, s in enumerate(streams):
            # one event per (day, stream): the daily mean is the exact
            # centi value, no HALF_UP boundary to mirror
            v = float(np.round(95 + 3 * si + rng.normal(0, 6), 2))
            mus[(day, s)] = round(v * 100)
            rows.append((eid, f"2024-01-{day:02d}", si, s, v, None))
            eid += 1
    sf = _write_events(tmp_path, rows)

    fr = get("q_friedman").fn(spark, sf).collect()[0]
    rank_sums = dict.fromkeys(streams, 0.0)
    for day in range(1, 26):
        vals = pd.Series({s: mus[(day, s)] for s in streams})
        rk = vals.rank(method="average")
        for s in streams:
            rank_sums[s] += rk[s]
    n, k = 25, 4
    q = (12.0 / (n * k * (k + 1))) * sum(r * r for r in rank_sums.values()) \
        - 3.0 * n * (k + 1)
    assert fr.n_blocks == n and fr.k == k
    assert abs(fr.friedman_q - q) < 1e-4 * max(1, q)

    cq = get("q_cochran_q").fn(spark, sf).collect()[0]
    hits = {(day, s): 1 if mus[(day, s)] > 10000 else 0
            for day in range(1, 26) for s in streams}
    cj = {s: sum(hits[(d, s)] for d in range(1, 26)) for s in streams}
    ri = {d: sum(hits[(d, s)] for s in streams) for d in range(1, 26)}
    sc, sc2 = sum(cj.values()), sum(v * v for v in cj.values())
    sr, sr2 = sum(ri.values()), sum(v * v for v in ri.values())
    want = (k - 1) * (k * sc2 - sc * sc) / (k * sr - sr2)
    assert cq.n_blocks == n and cq.k == k
    assert abs(cq.cochran_q - want) < 1e-4 * max(1, want)


def test_logrank_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(107)
    rows, eid = [], 0
    durs = []   # (duration_days, is_event, grp)
    horizon = 40
    for u in range(120):
        t0 = rng.randint(1, 6)
        rows.append((eid, f"2024-01-{t0:02d}", u, "view", 1.0, None))
        eid += 1
        # arm 1 (odd users) converts faster — planted hazard difference
        lam = 8 if u % 2 else 16
        wait = int(rng.exponential(lam)) + 1
        if t0 + wait <= horizon:
            day = t0 + wait
            rows.append((eid, f"2024-02-{day - 31:02d}" if day > 31
                         else f"2024-01-{day:02d}", u, "purchase",
                         1.0, None))
            eid += 1
            durs.append((wait, True, u % 2))
        else:
            durs.append((horizon - t0, False, u % 2))
    # pin the horizon: one late event so tmax is the same for everyone
    rows.append((eid, f"2024-02-{horizon - 31:02d}", 99990, "view",
                 1.0, None))
    durs.append((0, False, 0))  # the horizon user: duration 0, censored
    out = get("q_logrank").fn(spark, _write_events(tmp_path, rows)
                              ).collect()[0]
    times = sorted({t for t, e, g in durs if e})
    oe = v = 0.0
    n_events = 0
    for t in times:
        at = [(tt, ee, gg) for tt, ee, gg in durs if tt >= t]
        nn = len(at)
        n1 = sum(1 for tt, ee, gg in at if gg == 1)
        d = sum(1 for tt, ee, gg in durs if ee and tt == t)
        d1 = sum(1 for tt, ee, gg in durs if ee and tt == t and gg == 1)
        n_events += d
        oe += d1 - d * n1 / nn
        if nn > 1:
            v += d * (n1 / nn) * (1 - n1 / nn) * (nn - d) / (nn - 1)
    z = oe / np.sqrt(v)
    assert out.n_events == n_events
    assert abs(out.o_minus_e - oe) < 1e-3
    assert abs(out.variance - v) < 1e-3
    assert abs(out.z - z) < 1e-4
    assert out.z > 2    # the planted faster arm is detected


def test_cohens_d_odds_ratio_poisson_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(109)
    rows = []
    vals, arms = [], []
    for i in range(700):
        arm = i % 2
        v = float(np.round(rng.normal(100 + 6 * arm, 15), 2))
        rows.append((i, "2026-01-01", i, "t", v, None))
        vals.append(v)
        arms.append(arm)
    sf = _write_events(tmp_path, rows)
    v = np.array(vals)
    a = np.array(arms)

    d_out = get("q_cohens_d").fn(spark, sf).collect()[0]
    v0, v1 = v[a == 0], v[a == 1]
    pooled = np.sqrt((((v0 - v0.mean()) ** 2).sum()
                      + ((v1 - v1.mean()) ** 2).sum())
                     / (len(v) - 2))
    want_d = (v1.mean() - v0.mean()) / pooled
    assert (d_out.n0, d_out.n1) == (len(v0), len(v1))
    assert abs(d_out.cohens_d - want_d) < 1e-5

    o_out = get("q_odds_ratio").fn(spark, sf).collect()[0]
    hit = v > 100
    n11 = int((hit & (a == 1)).sum())
    n10 = int((~hit & (a == 1)).sum())
    n01 = int((hit & (a == 0)).sum())
    n00 = int((~hit & (a == 0)).sum())
    want_or = ((n11 + .5) * (n00 + .5)) / ((n10 + .5) * (n01 + .5))
    se = np.sqrt(1 / (n11 + .5) + 1 / (n10 + .5)
                 + 1 / (n01 + .5) + 1 / (n00 + .5))
    assert (o_out.n11, o_out.n10, o_out.n01, o_out.n00) == (
        n11, n10, n01, n00)
    assert abs(o_out.odds_ratio - want_or) < 1e-4
    assert abs(o_out.ci_lo - np.exp(np.log(want_or) - 1.959964 * se)) < 1e-2
    assert o_out.ci_lo > 1    # planted uplift crosses the 95% bar

    # poisson: every user has ONE event here, so exposures = counts
    # and the rate ratio is exactly 1 — plant an extra arm-1 burst
    burst = [(10_000 + i, "2026-01-02", 1 + 2 * (i % 50), "t", 1.0, None)
             for i in range(300)]
    p_out = get("q_poisson_rate").fn(
        spark, _write_events(tmp_path, rows + burst)).collect()[0]
    k0, k1 = 350, 350 + 300
    t0, t1 = 350, 350              # distinct users per arm unchanged
    rr = (k1 / t1) / (k0 / t0)
    assert (p_out.k0, p_out.k1) == (k0, k1)
    assert (p_out.exposure0, p_out.exposure1) == (t0, t1)
    assert abs(p_out.rate_ratio - rr) < 1e-6


def test_mcnemar_capture_recapture_match_direct(spark, tmp_path):
    # the two pseudo-rater hash splits are part of the queries'
    # definitions; mirror them exactly and verify the STATISTICS
    n = 500
    lens = [300 + 7 * (i % 60) for i in range(n)]
    pd.DataFrame({
        "doc_id": range(n), "text": ["x"] * n, "lang": ["en"] * n,
        "source": ["s"] * n, "n_chars": lens,
    }).to_parquet(tmp_path / "documents.parquet")

    m_out = get("q_mcnemar").fn(spark, str(tmp_path)).collect()[0]
    b = c = 0
    for i in range(n):
        m1 = ((i % 1000003) * 2654435761 % 1000003) % 100 < 60
        m2 = ((i % 1000003) * 40503 % 1000003) % 100 < 55
        y = lens[i] > 400
        b += (m1 == y) and (m2 != y)
        c += (m1 != y) and (m2 == y)
    want = (abs(b - c) - 1) ** 2 / (b + c)
    assert (m_out.only_m1_correct, m_out.only_m2_correct) == (b, c)
    assert abs(m_out.mcnemar_chi2 - want) < 1e-5

    cr_out = get("q_capture_recapture").fn(spark, str(tmp_path)).collect()[0]
    s1 = [((i % 1000003) * 2654435761 % 1000003) % 10 < 3 for i in range(n)]
    s2 = [((i % 1000003) * 40503 % 1000003) % 10 < 3 for i in range(n)]
    n1, n2 = sum(s1), sum(s2)
    nb = sum(a and b_ for a, b_ in zip(s1, s2))
    chapman = (n1 + 1) * (n2 + 1) / (nb + 1) - 1
    assert (cr_out.n1, cr_out.n2, cr_out.n_both) == (n1, n2, nb)
    assert cr_out.true_n == n
    assert abs(cr_out.chapman_estimate - chapman) < 1e-5
    # the estimator should land in the right ballpark of the truth
    assert abs(cr_out.rel_error) < 0.5


def test_stratified_ate_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(113)
    rows, eid = [], 0
    recs = []   # (stratum, arm, value)
    for si, (st, lift) in enumerate((("a", 3.0), ("b", 8.0), ("c", -2.0))):
        for i in range(150):
            arm = i % 2
            v = float(np.round(rng.normal(100 + 10 * si + lift * arm, 5),
                               2))
            rows.append((eid, "2026-01-01", i, st, v, None))
            recs.append((st, arm, v))
            eid += 1
    out = get("q_stratified_ate").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    strata = sorted({s for s, _, _ in recs})
    num = tot = 0.0
    for st in strata:
        v0 = np.array([v for s, a, v in recs if s == st and a == 0])
        v1 = np.array([v for s, a, v in recs if s == st and a == 1])
        w = len(v0) + len(v1)
        num += w * (v1.mean() - v0.mean())
        tot += w
    ate = num / tot
    assert out.n_strata == 3 and out.n == len(recs)
    assert abs(out.ate_stratified - ate) < 1e-4
    # per-stratum lifts average out to roughly (3 + 8 - 2) / 3
    assert 2.0 < out.ate_stratified < 4.0


def test_durbin_watson_and_pacf_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(127)
    x = np.zeros(400)
    for t in range(1, 400):
        x[t] = 0.6 * x[t - 1] + rng.normal()
    x = np.round(x, 4)
    rows = [(i, "2026-01-01", 1, "ar", float(v), None)
            for i, v in enumerate(x)]
    sf = _write_events(tmp_path, rows)

    dw = get("q_durbin_watson").fn(spark, sf).collect()[0]
    d = x - x.mean()
    want_dw = ((d[1:] - d[:-1]) ** 2).sum() / (d * d).sum()
    assert dw.n == len(x)
    assert abs(dw.durbin_watson - want_dw) < 1e-4
    assert dw.durbin_watson < 1.2   # planted positive autocorrelation

    pa = get("q_pacf").fn(spark, sf).collect()[0]
    r = [float((d[k:] * d[:-k]).sum() / (d * d).sum()) for k in (1, 2, 3)]
    # Durbin-Levinson by hand for lags 1-3
    phi11 = r[0]
    phi22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r[2] - phi21 * r[1] - phi22 * r[0]) \
        / (1 - phi21 * r[0] - phi22 * r[1])
    assert abs(pa.pacf1 - phi11) < 1e-4
    assert abs(pa.pacf2 - phi22) < 1e-4
    assert abs(pa.pacf3 - phi33) < 1e-4
    # an AR(1) series: pacf1 large, pacf2/3 near zero
    assert pa.pacf1 > 0.4 and abs(pa.pacf2) < 0.15 and abs(pa.pacf3) < 0.15


def test_seasonality_strength_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(131)
    rows, eid = [], 0
    vals, hours = [], []
    for day in range(1, 11):
        for h in range(24):
            for _ in range(3):
                v = float(np.round(
                    100 + 25 * np.sin(2 * np.pi * h / 24)
                    + rng.normal(0, 4), 2))
                rows.append((eid, f"2026-01-{day:02d} {h:02d}:15:00",
                             eid, "t", v, None))
                vals.append(v)
                hours.append(h)
                eid += 1
    out = get("q_seasonality_strength").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    v = np.array(vals)
    h = np.array(hours)
    ssb = sum((h == hh).sum() * (v[h == hh].mean() - v.mean()) ** 2
              for hh in range(24))
    sst = ((v - v.mean()) ** 2).sum()
    want = ssb / sst
    assert abs(out.seasonality_strength - want) < 1e-3
    means = {hh: v[h == hh].mean() for hh in range(24)}
    assert out.peak_hour == max(means, key=lambda hh: (means[hh], -hh))
    assert out.seasonality_strength > 0.8   # the planted diurnal cycle


def test_gwet_ac1_matches_direct(spark, tmp_path):
    n = 600
    pd.DataFrame({
        "doc_id": range(n), "text": ["x"] * n, "lang": ["en"] * n,
        "source": ["s"] * n, "n_chars": [100] * n,
    }).to_parquet(tmp_path / "documents.parquet")
    out = get("q_gwet_ac1").fn(spark, str(tmp_path)).collect()[0]
    r1, r2 = [], []
    for i in range(n):
        h = i % 1000003
        a = (h * 2654435761 % 1000003) % 3
        r1.append(a)
        r2.append(a if (h * 40503 % 1000003) % 10 < 8 else (
            ((h * 2654435761 % 1000003) + 1) % 3))
    po = sum(x == y for x, y in zip(r1, r2)) / n
    pe = sum((pi := (r1.count(c) + r2.count(c)) / (2 * n)) * (1 - pi)
             for c in range(3)) / (3 - 1)
    ac1 = (po - pe) / (1 - pe)
    assert out.n_docs == n
    assert abs(out.p_observed - po) < 1e-6
    assert abs(out.ac1 - ac1) < 1e-5
    assert out.ac1 > 0.5   # the planted 80% agreement shows through


def test_chao1_matches_direct_spectrum(spark, tmp_path):
    # vocabulary with a known frequency spectrum: 20 singleton types,
    # 10 doubletons, 5 types seen 4x
    words = ([f"solo{i}" for i in range(20)]
             + [w for i in range(10) for w in [f"duo{i}"] * 2]
             + [w for i in range(5) for w in [f"quad{i}"] * 4])
    docs = [" ".join(words[i::3]) for i in range(3)]
    pd.DataFrame({
        "doc_id": range(3), "text": docs, "lang": ["en"] * 3,
        "source": ["s"] * 3, "n_chars": [len(d) for d in docs],
    }).to_parquet(tmp_path / "documents.parquet")
    out = get("q_chao1").fn(spark, str(tmp_path)).collect()[0]
    v, f1, f2, ntok = 35, 20, 10, 60
    assert (out.n_types, out.f1, out.f2, out.n_tokens) == (v, f1, f2, ntok)
    assert abs(out.chao1 - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-6
    assert abs(out.coverage - (1 - f1 / ntok)) < 1e-6


def test_theilsen_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(137)
    rows, eid = [], 0
    want = {}
    for u in (1, 2):
        nn = 9
        ts = np.sort(rng.choice(np.arange(1, 28), nn, replace=False))
        v = np.round(2.5 * u * ts + rng.normal(0, 3, nn), 3)
        for t, x in zip(ts, v):
            rows.append((eid, f"2026-03-{t:02d} 12:00:00", u,
                         "purchase", float(x), None))
            eid += 1
        slopes = [(v[j] - v[i]) / (ts[j] - ts[i])
                  for i in range(nn) for j in range(i + 1, nn)]
        want[u] = (len(slopes), float(np.median(slopes)))
    out = {r.user_id: r for r in
           get("q_theilsen").fn(spark, _write_events(tmp_path, rows)
                                ).collect()}
    for u in (1, 2):
        assert out[u].n_pairs == want[u][0], u
        assert abs(out[u].slope_per_day - want[u][1]) < 1e-5, u
        # the planted trend is recovered within the noise
        assert abs(out[u].slope_per_day - 2.5 * u) < 1.0, u


def _write_embeddings(tmp_path, vecs, labels):
    pd.DataFrame({
        "vec_id": range(len(vecs)),
        "embedding": [np.asarray(v, np.float32) for v in vecs],
        "label": np.asarray(labels, np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_ece_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(139)
    n = 400
    labels = rng.randint(0, 10, n)
    vecs = [rng.randn(8).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, labels)
    out = get("q_ece").fn(spark, sf).collect()[0]
    bins = {}
    for i in range(n):
        p_milli = 80 * labels[i] + ((i % 1000003) * 2654435761 % 1000) // 5
        b = min(p_milli // 100, 9)
        nn, sp, sy = bins.get(b, (0, 0, 0))
        bins[b] = (nn + 1, sp + p_milli,
                   sy + (1 if labels[i] >= 5 else 0))
    gaps = {b: abs(sp / 1000 - sy) for b, (nn, sp, sy) in bins.items()}
    ece = sum(gaps.values()) / n
    mce = max(gaps[b] / bins[b][0] for b in bins)
    assert out.n == n and out.n_bins == len(bins)
    assert abs(out.ece - ece) < 1e-5
    assert abs(out.mce - mce) < 1e-5


def test_recall_at_k_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(149)
    n = 300
    labels = rng.randint(0, 10, n)
    vecs = [rng.randn(8).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, labels)
    rows = {r.qid: r for r in
            get("q_recall_at_k").fn(spark, sf).collect()}
    for qid in range(20):
        members = [(round(float(vecs[i][0]), 6), i,
                    1 if labels[i] >= 7 else 0)
                   for i in range(n) if i % 20 == qid]
        members.sort(key=lambda t: (-t[0], t[1]))
        hits = sum(rel for _, _, rel in members[:10])
        n_rel = sum(rel for _, _, rel in members)
        r = rows[qid]
        assert (r.n_rel, r.hits_at_10) == (n_rel, hits), qid
        if n_rel:
            assert abs(r.recall_at_10 - hits / n_rel) < 1e-6, qid


def test_topk_overlap_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(151)
    vocab = [f"w{i:03d}" for i in range(150)]
    docs = []
    for d in range(40):
        # snapshot a (even ids) samples low vocab ids more heavily
        w = rng.choice(150, 60, p=np.linspace(
            2.0 if d % 2 == 0 else 0.5,
            0.5 if d % 2 == 0 else 2.0, 150)
            / np.linspace(2.0 if d % 2 == 0 else 0.5,
                          0.5 if d % 2 == 0 else 2.0, 150).sum())
        docs.append(" ".join(vocab[i] for i in w))
    pd.DataFrame({
        "doc_id": range(40), "text": docs, "lang": ["en"] * 40,
        "source": ["s"] * 40, "n_chars": [len(t) for t in docs],
    }).to_parquet(tmp_path / "documents.parquet")
    out = get("q_topk_overlap").fn(spark, str(tmp_path)).collect()[0]

    def topk(snap):
        cnt = {}
        for d in range(snap, 40, 2):
            for w in docs[d].split():
                cnt[w] = cnt.get(w, 0) + 1
        order = sorted(cnt, key=lambda w: (-cnt[w], w))
        return set(order[:100])

    a, b = topk(0), topk(1)
    assert (out.k_a, out.k_b) == (len(a), len(b))
    assert out.k_common == len(a & b)
    assert abs(out.overlap_at_k
               - len(a & b) / min(len(a), len(b))) < 1e-6


def test_info_gain_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(157)
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    rows = []
    for p in pris:
        for _ in range(200):
            hi = rng.rand() < 0.5
            # outcome correlates with the split only for 1-URGENT
            py = (0.8 if hi else 0.2) if p == "1-URGENT" else 0.5
            rows.append((p, 300000.0 if hi else 100000.0,
                         "F" if rng.rand() < py else "O"))
    pd.DataFrame(rows, columns=["o_orderpriority", "o_totalprice",
                                "o_orderstatus"]
                 ).to_parquet(tmp_path / "orders.parquet")
    out = {r.pri: r for r in
           get("q_info_gain").fn(spark, str(tmp_path)).collect()}

    def ent(pos, n):
        if pos in (0, n):
            return 0.0
        p = pos / n
        return -p * np.log(p) - (1 - p) * np.log(1 - p)

    for p in pris:
        sub = [(v >= 250000, s == "F") for q, v, s in rows if q == p]
        n = len(sub)
        pos = sum(y for _, y in sub)
        n_hi = sum(h for h, _ in sub)
        pos_hi = sum(y for h, y in sub if h)
        ig = (ent(pos, n)
              - n_hi / n * ent(pos_hi, n_hi)
              - (n - n_hi) / n * ent(pos - pos_hi, n - n_hi))
        assert abs(out[p].info_gain_milli - ig * 1000) < 1e-3, p
    # only the planted-informative group carries real gain
    assert out["1-URGENT"].info_gain_milli > 100
    assert out["2-HIGH"].info_gain_milli < 20


def test_smd_balance_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(163)
    rows, eid = [], 0
    per_user = {}
    for u in range(120):
        n_ev = rng.randint(1, 8) + (2 if u % 2 else 0)   # imbalance
        spend = 0
        for i in range(n_ev):
            is_p = rng.rand() < 0.4
            v = float(np.round(rng.uniform(5, 50), 2))
            rows.append((eid, "2026-01-01", u,
                         "purchase" if is_p else "view", v, None))
            if is_p:
                spend += round(v * 100)
            eid += 1
        per_user[u] = (spend, n_ev)
    out = {r.covariate: r for r in
           get("q_smd_balance").fn(spark, _write_events(tmp_path, rows)
                                   ).collect()}
    for cov, idx in (("spend_centi", 0), ("n_events", 1)):
        x0 = np.array([per_user[u][idx] for u in per_user if u % 2 == 0],
                      float)
        x1 = np.array([per_user[u][idx] for u in per_user if u % 2 == 1],
                      float)
        smd = (x1.mean() - x0.mean()) / np.sqrt(
            (x0.var(ddof=1) + x1.var(ddof=1)) / 2)
        r = out[cov]
        assert abs(r.mean_ctrl - x0.mean()) < 1e-4, cov
        assert abs(r.mean_treat - x1.mean()) < 1e-4, cov
        assert abs(r.smd - smd) < 1e-4, cov
    assert out["n_events"].smd > 0.5   # the planted imbalance


def test_hhi_and_session_entropy_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(167)
    # hhi over documents: one concentrated language, one balanced
    srcs = (["s0"] * 60 + ["s1"] * 5 + ["s2"] * 5,      # concentrated
            ["s0"] * 24 + ["s1"] * 23 + ["s2"] * 23)    # balanced
    langs, sources = [], []
    for lang, ss in zip(("aa", "bb"), srcs):
        langs += [lang] * len(ss)
        sources += ss
    pd.DataFrame({
        "doc_id": range(len(langs)), "text": ["x"] * len(langs),
        "lang": langs, "source": sources, "n_chars": [9] * len(langs),
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r.lang: r for r in
           get("q_hhi").fn(spark, str(tmp_path)).collect()}
    for lang, ss in zip(("aa", "bb"), srcs):
        ks = np.array([ss.count(s) for s in sorted(set(ss))], float)
        raw = (ks ** 2).sum() / ks.sum() ** 2
        norm = (raw - 1 / len(ks)) / (1 - 1 / len(ks))
        assert abs(out[lang].hhi - raw * 10000) < 1e-3, lang
        assert abs(out[lang].hhi_normalized - norm) < 1e-5, lang
    assert out["aa"].hhi > out["bb"].hhi   # concentration detected

    # session entropy over events: user 0 single-type, user 1 diverse
    rows = [(i, "2026-01-01", 0, "view", 1.0, None) for i in range(20)]
    rows += [(100 + i, "2026-01-01", 1,
              ["view", "click", "purchase", "error"][i % 4], 1.0, None)
             for i in range(20)]
    ent = {r.cohort: r for r in
           get("q_session_entropy").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    # user 0 (cohort 0): all one type -> H = 0; user 1 (cohort 1):
    # uniform over 4 types -> H = ln 4
    assert abs(ent[0].mean_entropy - 0.0) < 1e-6
    assert abs(ent[1].mean_entropy - np.log(4)) < 1e-5


def test_lorenz_points_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(173)
    lens = (rng.lognormal(6, 1.2, 500).astype(int) + 1)
    pd.DataFrame({
        "doc_id": range(500), "text": ["x"] * 500, "lang": ["en"] * 500,
        "source": ["s"] * 500, "n_chars": lens,
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r.decile: r for r in
           get("q_lorenz_points").fn(spark, str(tmp_path)).collect()}
    # equal-count deciles over (n_chars, doc_id)-sorted docs, remainder
    # spread over the FIRST deciles (n_total % 10 deciles get one extra)
    order = sorted(range(500), key=lambda i: (lens[i], i))
    xs = np.array([lens[i] for i in order], float)
    sizes = [50] * 10            # 500 divides evenly
    cum = 0.0
    pos = 0
    for dec in range(1, 11):
        chunk = xs[pos:pos + sizes[dec - 1]]
        pos += sizes[dec - 1]
        cum += chunk.sum()
        r = out[dec]
        assert r.n_docs == sizes[dec - 1], dec
        assert abs(r.cum_char_share - cum / xs.sum()) < 1e-6, dec
    # Lorenz curve is convex: top decile holds the biggest share
    assert out[10].cum_char_share == 1.0


def test_jaccard_drift_and_forecast_accuracy_match(spark, tmp_path):
    # jaccard over snapshots by doc parity, whitespace tokens
    texts = ["alpha beta gamma", "beta gamma delta",
             "alpha beta epsilon", "gamma delta zeta"]
    pd.DataFrame({
        "doc_id": range(4), "text": texts, "lang": ["en"] * 4,
        "source": ["s"] * 4, "n_chars": [len(t) for t in texts],
    }).to_parquet(tmp_path / "documents.parquet")
    out = get("q_jaccard_drift").fn(spark, str(tmp_path)).collect()[0]
    a = {w for i in (0, 2) for w in texts[i].split()}
    b = {w for i in (1, 3) for w in texts[i].split()}
    assert (out.vocab_a, out.vocab_b) == (len(a), len(b))
    assert out.vocab_common == len(a & b)
    assert abs(out.jaccard - len(a & b) / len(a | b)) < 1e-6

    # naive-persistence forecast: daily sums, pred = yesterday
    rng = np.random.RandomState(179)
    daily = np.round(rng.uniform(50, 150, 12), 2)
    rows = [(i, f"2026-04-{i + 1:02d}", 1, "t", float(v), None)
            for i, v in enumerate(daily)]
    f_out = get("q_forecast_accuracy").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    actual = np.round(daily * 100)
    err = actual[1:] - actual[:-1]
    mape = np.mean(np.abs(err) / np.abs(actual[1:]))
    rmse = np.sqrt((err ** 2).mean()) / 100   # engine: original units
    assert f_out.n_days == 11
    # engine reports centi-integer errors; compare the relative metric
    assert abs(f_out.mape_pct - mape * 100) < 1e-4
    assert abs(f_out.rmse - rmse) < 1e-3 * max(1, rmse)


def test_kl_psi_drift_match_numpy(spark, tmp_path):
    # KL over documents: snapshot mix shifts from s0-heavy to s1-heavy
    srcs = []
    for i in range(300):
        if i % 2 == 0:
            srcs.append("s0" if i % 10 < 7 else "s1")   # snapshot a
        else:
            srcs.append("s0" if i % 10 < 3 else "s1")   # snapshot b
    pd.DataFrame({
        "doc_id": range(300), "text": ["x"] * 300, "lang": ["en"] * 300,
        "source": srcs, "n_chars": [9] * 300,
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r.source: r for r in
           get("q_kl_drift").fn(spark, str(tmp_path)).collect()}
    ca = {s: 1 + sum(1 for i in range(0, 300, 2) if srcs[i] == s)
          for s in ("s0", "s1")}
    cb = {s: 1 + sum(1 for i in range(1, 300, 2) if srcs[i] == s)
          for s in ("s0", "s1")}
    ta, tb = sum(ca.values()), sum(cb.values())
    for s in ("s0", "s1"):
        pa, pb = ca[s] / ta, cb[s] / tb
        assert out[s].n_a == ca[s] and out[s].n_b == cb[s], s
        assert abs(out[s].kl_term_milli
                   - pa * np.log(pa / pb) * 1000) < 1e-4, s

    # PSI over events: ref window binned by its own range, cur shifted
    rng = np.random.RandomState(181)
    ref = np.round(rng.uniform(10, 20, 400), 3)
    cur = np.round(rng.uniform(12, 26, 300), 3)
    rows = [(i, "2024-01-05", i, "t", float(v), None)
            for i, v in enumerate(ref)]
    rows += [(10_000 + i, "2024-01-25", i, "t", float(v), None)
             for i, v in enumerate(cur)]
    psi_rows = get("q_psi_drift").fn(
        spark, _write_events(tmp_path, rows)).collect()
    mn, mx = ref.min(), ref.max()

    def binv(v):
        return int(min(9, max(0, np.floor((v - mn) * 10 / (mx - mn)))))

    nr = np.bincount([binv(v) for v in ref], minlength=10)
    nc = np.bincount([binv(v) for v in cur], minlength=10)
    got = {r.bin: r for r in psi_rows}
    for b in range(10):
        if b in got:
            assert got[b].n_ref == nr[b] and got[b].n_cur == nc[b], b


def test_corr_matrix_and_novelty_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(191)
    rows, eid = [], 0
    va, vb = [], []
    for u in range(200):
        x = rng.normal(10, 2)
        y = 0.8 * x + rng.normal(0, 1)      # planted correlation
        rows.append((eid, "2026-01-01", u, "aa", float(x), None))
        rows.append((eid + 1, "2026-01-01", u, "bb", float(y), None))
        eid += 2
        va.append(x)
        vb.append(y)
    out = get("q_corr_matrix").fn(
        spark, _write_events(tmp_path, rows)).collect()
    r = [x for x in out if x.type_a == "aa" and x.type_b == "bb"][0]
    want = np.corrcoef(va, vb)[0, 1]
    assert r.n_users == 200
    assert abs(r.pearson_r - want) < 1e-5
    assert r.pearson_r > 0.7

    # novelty: batches by doc_id % 4, duplicates planted across batches
    texts = []
    for i in range(200):
        if i % 4 == 0:
            texts.append(f"novel text {i}")          # batch 0: all new
        else:
            # later batches: half repeat a batch-0 text
            texts.append(f"novel text {i - i % 4}" if i % 8 < 4
                         else f"fresh {i}")
    pd.DataFrame({
        "doc_id": range(200), "text": texts, "lang": ["en"] * 200,
        "source": ["s"] * 200, "n_chars": [len(t) for t in texts],
    }).to_parquet(tmp_path / "documents.parquet")
    nv = {r.batch: r for r in
          get("q_novelty_rate").fn(spark, str(tmp_path)).collect()}
    first = {}
    for i, t in enumerate(texts):
        first.setdefault(t, i % 4)
    for b in range(4):
        docs_b = [i for i in range(200) if i % 4 == b]
        novel = sum(1 for i in docs_b if first[texts[i]] == i % 4)
        assert nv[b].n_docs == len(docs_b), b
        assert nv[b].n_novel == novel, b
    assert nv[0].novelty_rate == 1.0          # the seed batch is all new
    assert nv[1].novelty_rate < 1.0           # planted repeats detected


def test_qq_points_match_numpy(spark, tmp_path):
    rng = np.random.RandomState(193)
    a = np.round(rng.normal(50, 10, 301), 3)     # arm 0 (even users)
    b = np.round(rng.normal(58, 14, 300), 3)     # arm 1: shifted+wider
    rows = [(i, "2026-01-01", 2 * i, "t", float(v), None)
            for i, v in enumerate(a)]
    rows += [(1000 + i, "2026-01-01", 2 * i + 1, "t", float(v), None)
             for i, v in enumerate(b)]
    out = {r.pct: r for r in
           get("q_qq_points").fn(spark, _write_events(tmp_path, rows)
                                 ).collect()}
    for k in range(1, 10):
        q0 = np.percentile(a, 10 * k)    # linear interp = Spark default
        q1 = np.percentile(b, 10 * k)
        r = out[10 * k]
        assert abs(r.q_arm0 - q0) < 1e-5, k
        assert abs(r.q_arm1 - q1) < 1e-5, k
        assert abs(r.qq_gap - (q1 - q0)) < 1e-5, k
    # the planted shift shows at the median
    assert out[50].qq_gap > 4


def test_retention_and_markov_match_direct(spark, tmp_path):
    # three Monday-started weeks; users return on known week offsets
    plan = {0: [0, 1, 2], 1: [0, 2], 2: [0], 3: [0, 1], 4: [0]}
    rows, eid = [], 0
    for u, weeks in plan.items():
        for w in weeks:
            day = 5 + 7 * w      # 2026-01-05 is a Monday
            rows.append((eid, f"2026-01-{day:02d} 10:00:00", u,
                         "view", 1.0, None))
            eid += 1
    out = {(r.cohort_week, r.week_offset): r for r in
           get("q_retention_cohorts").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    # everyone first appears in the same cohort week
    week0 = "2026-01-05"
    assert set(k[0] for k in out) == {week0}
    expect = {0: 5, 1: 2, 2: 2}   # actives per offset
    for off, n in expect.items():
        r = out[(week0, off)]
        assert r.n_active == n, off
        assert abs(r.retention - n / 5) < 1e-6, off

    # markov transitions over one user's known sequence
    seq = ["view", "click", "view", "purchase", "view", "click"]
    rows2 = [(i, f"2026-02-01 00:00:{i:02d}", 7, t, 1.0, None)
             for i, t in enumerate(seq)]
    mk = {(r.prev_type, r.next_type): r for r in
          get("q_markov_transitions").fn(
              spark, _write_events(tmp_path, rows2)).collect()}
    assert mk[("view", "click")].c == 2
    assert mk[("click", "view")].c == 1
    assert mk[("view", "purchase")].c == 1
    assert mk[("purchase", "view")].c == 1
    assert abs(mk[("view", "click")].p - 2 / 3) < 1e-6
    assert abs(mk[("view", "purchase")].p - 1 / 3) < 1e-6


def test_vocab_growth_matches_direct(spark, tmp_path):
    # doc ids 0..9 -> one per bucket; vocabulary grows by construction
    texts = [" ".join(f"w{j}" for j in range(i + 1)) for i in range(10)]
    pd.DataFrame({
        "doc_id": range(10), "text": texts, "lang": ["en"] * 10,
        "source": ["s"] * 10, "n_chars": [len(t) for t in texts],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r.bucket: r for r in
           get("q_vocab_growth").fn(spark, str(tmp_path)).collect()}
    cum_types = 0
    cum_toks = 0
    for b in range(10):
        cum_toks += b + 1            # doc b has b+1 tokens
        cum_types = b + 1            # exactly one new type per doc
        r = out[b]
        assert r.cum_tokens == cum_toks, b
        assert r.cum_types == cum_types, b
        assert abs(r.cum_ttr - cum_types / cum_toks) < 1e-6, b


def test_changepoint_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(197)
    # planted level shift at index 150 of 400
    x = np.concatenate([rng.normal(20, 1.5, 150),
                        rng.normal(28, 1.5, 250)])
    x = np.round(x, 4)
    rows = [(i, "2026-01-01", 1, "t", float(v), None)
            for i, v in enumerate(x)]
    out = get("q_changepoint").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    xu = np.round(x * 1e6).astype(np.int64)
    n = len(xu)
    st = np.cumsum(xu)
    stat = np.abs(n * st[:-1] - np.arange(1, n) * st[-1])
    idx = int(np.argmax(stat)) + 1        # 1-based, first max wins
    shift = stat[idx - 1] / idx / (n - idx) / 1e6
    assert out.change_idx == idx
    assert abs(out.mean_shift - shift) < 1e-4
    assert abs(idx - 150) <= 2            # the planted break is found
    assert abs(shift - 8.0) < 1.0         # ... with its magnitude


def test_sprt_matches_direct_walk(spark, tmp_path):
    import math

    rng = np.random.RandomState(199)
    # p(true) = 0.72 > 34-threshold rate 0.55 -> early accept_h1
    vals = [50.0 if rng.rand() < 0.72 else 20.0 for _ in range(300)]
    rows = [(i, "2026-01-01", 1, "t", float(v), None)
            for i, v in enumerate(vals)]
    out = get("q_sprt").fn(spark, _write_events(tmp_path, rows)
                           ).collect()[0]
    l1, l0 = math.log(0.55 / 0.45), math.log(0.45 / 0.55)
    bound = math.log(19.0)
    llr, cross_n, cross_llr = 0.0, None, None
    for i, v in enumerate(vals, start=1):
        llr += l1 if v > 34 else l0
        if cross_n is None and (llr >= bound or llr <= -bound):
            cross_n, cross_llr = i, llr
    assert out.n_obs == len(vals)
    assert out.decision == "accept_h1"
    assert out.n_at_decision == cross_n
    assert abs(out.llr_at_decision - cross_llr) < 1e-5
    assert cross_n < 60     # the planted effect decides early


def test_page_hinkley_matches_direct_fold(spark, tmp_path):
    rng = np.random.RandomState(211)
    # one event per day: daily mean == exact micro value (no rounding);
    # mean drifts upward from day 20 -> alarm
    rows, mus = [], []
    for d in range(1, 31):
        v = float(np.round(100 + (0 if d < 20 else 3 * (d - 19))
                           + rng.normal(0, 0.5), 4))
        day = f"2026-01-{d:02d}" if d <= 31 else None
        rows.append((d, day, 1, "t", v, None))
        mus.append(round(v * 1e6))
    out = get("q_page_hinkley").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    s, u, minu, alarm = 0, 0.0, 0.0, None
    for i, mu in enumerate(mus, start=1):
        s += mu
        u += (mu - s / i) - 1_000_000.0
        minu = min(minu, u)
        if alarm is None and u - minu >= 5_000_000.0:
            alarm = i
    assert out.n_days == 30
    assert abs(out.ph_stat - (u - minu) / 1e6) < 1e-4
    assert out.alarm_day == alarm
    assert alarm is not None and alarm >= 20   # fires after the drift


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    pd.DataFrame({
        "doc_id": range(n), "text": texts, "lang": ["en"] * n,
        "source": sources or ["s"] * n,
        "n_chars": [len(t) if t else 0 for t in texts],
    }).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_tfidf_and_bm25_match_direct(spark, tmp_path):
    texts = ["spark join window spark",
             "join join filter",
             "window scan spark join",
             "filter scan scan"]
    sf = _write_docs(tmp_path, texts)
    n = len(texts)

    out = {(r.doc_id, r.tok): r for r in
           get("q_tfidf").fn(spark, sf).collect()}
    df = {}
    for t in texts:
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    for (doc, tok), r in out.items():
        tf = texts[doc].split().count(tok)
        want = tf * np.log(n / df[tok])
        assert abs(r.tfidf - round(want, 6)) < 1e-9, (doc, tok)
    # doc 0's top term: 'spark' (tf 2, df 3) vs 'window' (tf 1, df 2)
    top0 = [k for k, r in out.items() if k[0] == 0 and r.rank == 1]
    assert top0 == [(0, "spark")]

    bm = {r.doc_id: r for r in get("q_bm25").fn(spark, sf).collect()}
    dls = [len(t.split()) for t in texts]
    avgdl = sum(dls) / n
    for doc in bm:
        score = 0.0
        for tok in ("spark", "join", "window"):
            tf = texts[doc].split().count(tok)
            if tf == 0:
                continue
            dfq = sum(1 for t in texts if tok in t.split())
            idf = np.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
            score += idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dls[doc] / avgdl))
        assert abs(bm[doc].bm25 - round(score, 6)) < 1e-6, doc


def test_unigram_logprob_and_perplexity_match_direct(spark, tmp_path):
    texts = ["aa aa bb", "bb cc", "aa cc cc dd"]
    sf = _write_docs(tmp_path, texts, sources=["s0", "s0", "s1"])

    freq = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    big_n = sum(freq.values())

    out = {r.doc_id: r for r in
           get("q_unigram_logprob").fn(spark, sf).collect()}
    for i, t in enumerate(texts):
        ws = t.split()
        want = np.mean([np.log(freq[w] / big_n) for w in ws])
        assert out[i].n_tok == len(ws), i
        assert abs(out[i].avg_logprob - round(want, 6)) < 1e-9, i

    pp = {r.source: r for r in
          get("q_perplexity").fn(spark, sf).collect()}
    v = len(freq)
    for src, docs in (("s0", (0, 1)), ("s1", (2,))):
        toks = [w for d in docs for w in texts[d].split()]
        # Laplace-smoothed LM over the WHOLE corpus vocabulary
        lps = [round(np.log((freq[w] + 1) / (big_n + v)) * 1e9)
               for w in toks]
        ce = -sum(lps) / 1e9 / len(toks)
        assert pp[src].n_tokens == len(toks), src
        assert abs(pp[src].cross_entropy - round(ce, 6)) < 1e-9, src
        assert abs(pp[src].perplexity - round(np.exp(ce), 6)) < 1e-5, src


def test_text_quality_trio_matches_direct(spark, tmp_path):
    texts = ["aabbbcc",                       # known char distribution
             "One sentence here. And two more! Done?",
             "tok tok unique other other other"]
    sf = _write_docs(tmp_path, texts)

    ce = {r.doc_id: r for r in
          get("q_char_entropy").fn(spark, sf).collect()}
    t = texts[0]
    n = len(t)
    counts = [t.count(c) for c in sorted(set(t))]
    want = np.log(n) - sum(k * round(np.log(k), 12) for k in counts) / n
    assert ce[0].n_distinct == 3
    assert abs(ce[0].entropy - round(want, 4)) < 1e-9  # engine rounds at 4

    ari = {r.doc_id: r for r in
           get("q_readability_ari").fn(spark, sf).collect()}
    import re
    t1 = texts[1]
    nc = len(re.sub(r"[^!-~]", "", t1))
    nw = len([w for w in re.split(r"\s+", t1.lower()) if w])
    ns = max(1, len(re.split(r"[.!?]+", t1)) - 1)
    want_ari = round((471 * nc * ns + 50 * nw * nw - 2143 * nw * ns)
                     * 100.0 / (nw * ns)) / 10000.0
    assert ari[1].n_words == nw and ari[1].n_sents == ns
    assert abs(ari[1].ari - want_ari) < 1e-9

    tt = {r.source: r for r in
          get("q_ttr_hapax").fn(spark, sf).collect()}
    toks = [w for t_ in texts for w in t_.split()]
    types = set(toks)
    hapax = sum(1 for w in types if toks.count(w) == 1)
    r = tt["s"]
    assert r.n_tokens == len(toks) and r.n_types == len(types)
    assert r.n_hapax == hapax
    assert abs(r.ttr - round(len(types) / len(toks), 6)) < 1e-9


def test_dsir_matches_direct(spark, tmp_path):
    import hashlib

    texts = ["the quick brown fox", "der schnelle braune fuchs",
             "the lazy dog", "le chien paresseux"]
    langs = ["en", "de", "en", "fr"]
    pd.DataFrame({
        "doc_id": range(4), "text": texts, "lang": langs,
        "source": ["s"] * 4, "n_chars": [len(t) for t in texts],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r.doc_id: r for r in
           get("q_dsir").fn(spark, str(tmp_path)).collect()}

    def bkt(tok):
        return hashlib.md5(tok.encode()).hexdigest()[:2]

    all_b, tgt_b = [], []
    per_doc = {}
    for i, (t, lg) in enumerate(zip(texts, langs)):
        bs = [bkt(w) for w in t.lower().split()]
        per_doc[i] = bs
        all_b += bs
        if lg == "en":
            tgt_b += bs
    cr = {b: all_b.count(b) for b in set(all_b)}
    ct = {b: tgt_b.count(b) for b in set(all_b)}
    n_r, n_t = len(all_b), len(tgt_b)
    lr_nano = {b: round((np.log((ct[b] + 1) / (n_t + 256))
                         - np.log((cr[b] + 1) / (n_r + 256))) * 1e9)
               for b in cr}
    for i, bs in per_doc.items():
        want = sum(lr_nano[b] for b in bs) / 1e9  # SUM, not mean
        assert out[i].n_tok == len(bs), i
        assert abs(out[i].log_weight - round(want, 6)) < 1e-5, i
    # English docs must importance-weight HIGHER toward the en target
    assert min(out[0].log_weight, out[2].log_weight) > \
        max(out[1].log_weight, out[3].log_weight)


def test_mann_whitney_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(223)
    a = np.round(rng.normal(10, 2, 250), 1)    # ties via 1dp grid
    b = np.round(rng.normal(11, 2, 200), 1)    # planted shift
    rows = [(i, "2026-01-01", 0, "t", float(v), None)
            for i, v in enumerate(a)]
    rows += [(1000 + i, "2026-01-01", 1, "t", float(v), None)
             for i, v in enumerate(b)]
    out = get("q_mann_whitney").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    pooled = np.concatenate([a, b])
    ranks = pd.Series(pooled).rank(method="average").to_numpy()
    ra = ranks[:len(a)].sum()
    u = ra - len(a) * (len(a) + 1) / 2
    nn = len(pooled)
    _, counts = np.unique(pooled, return_counts=True)
    var = (len(a) * len(b) / 12.0
           * ((nn + 1) - (counts ** 3 - counts).sum() / (nn * (nn - 1))))
    z = (u - len(a) * len(b) / 2) / np.sqrt(var)
    assert (out.n_a, out.n_b) == (len(a), len(b))
    assert abs(out.u_stat - u) < 0.11
    assert abs(out.z - z) < 1e-5
    assert out.z < -3   # planted shift (b larger -> a's U small)


def test_lift_gains_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(227)
    n = 500
    scores = np.round(rng.uniform(-1, 1, n), 4).astype(np.float32)
    # outcome probability increases with the score -> top deciles lift
    labels = np.where(rng.rand(n) < 0.2 + 0.3 * (scores > 0.3), 7, 2)
    vecs = [np.concatenate([[s], rng.randn(7)]).astype(np.float32)
            for s in scores]
    sf = _write_embeddings(tmp_path, vecs, labels)
    out = {r.decile: r for r in
           get("q_lift_gains").fn(spark, sf).collect()}
    order = sorted(range(n), key=lambda i: (-round(float(scores[i]), 6), i))
    y = np.array([1 if labels[i] >= 5 else 0 for i in order])
    tp = y.sum()
    cum = 0
    for d in range(10):
        rows_d = y[(np.arange(n) * 10 // n) == d]
        cum += rows_d.sum()
        r = out[d]
        assert r.n_pos == rows_d.sum(), d
        assert abs(r.capture_pct - round(100.0 * cum / tp, 6)) < 1e-4, d
        want_lift = (rows_d.sum() / len(rows_d)) / (tp / n)
        assert abs(r.lift - want_lift) < 1e-4, d
    assert out[0].lift > 1.2 > out[9].lift   # planted score signal


def test_ohlc_bars_match_direct(spark, tmp_path):
    rng = np.random.RandomState(229)
    rows = []
    recs = []
    for i in range(120):
        h, mi = i % 4, (i * 7) % 60
        ts = f"2024-01-01 {h:02d}:{mi:02d}:{i % 50:02d}"
        v = float(np.round(rng.uniform(10, 30), 4))
        rows.append((i, ts, 1, "t", v, None))
        recs.append((h, ts, i, v))
    out = {r.bar: r for r in
           get("q_ohlc_bars").fn(spark, _write_events(tmp_path, rows)
                                 ).collect()}
    for h in range(4):
        bar = f"2024-01-01 {h:02d}:00"
        sub = sorted([(ts, i, v) for hh, ts, i, v in recs if hh == h])
        r = out[bar]
        assert r.volume == len(sub), h
        assert abs(r.open - sub[0][2]) < 1e-9, h
        assert abs(r.close - sub[-1][2]) < 1e-9, h
        assert abs(r.high - max(v for _, _, v in sub)) < 1e-9, h
        assert abs(r.low - min(v for _, _, v in sub)) < 1e-9, h


def test_kmeans_step_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(233)
    n, dim = 100, 6
    vecs = [rng.randn(dim).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, rng.randint(0, 10, n))
    out = {(r.cid, r.pos): r for r in
           get("q_kmeans_step").fn(spark, sf).collect()}
    cents = {cid: np.asarray(vecs[cid], np.float64) for cid in range(8)}
    assign = {}
    for i, v in enumerate(vecs):
        vd = np.asarray(v, np.float64)
        best = min(((round(float(((vd - c) ** 2).sum()), 6), cid)
                    for cid, c in cents.items()))
        assign.setdefault(best[1], []).append(vd)
    for cid, members in assign.items():
        m = np.mean(members, axis=0)
        for pos in range(dim):
            r = out[(cid, pos)]
            assert r.n_members == len(members), (cid, pos)
            assert abs(r.centroid_val - round(float(m[pos]), 6)) < 1e-9, \
                (cid, pos)
    assert set(c for c, _ in out) == set(assign)   # same live clusters


def test_sessionize_and_burstiness_match_direct(spark, tmp_path):
    # one user: gaps 10min, 40min (split), 5min -> sessions [3, 1] on
    # event counts... construct explicitly
    stamps = ["2026-05-01 10:00:00", "2026-05-01 10:10:00",
              "2026-05-01 10:50:01",      # > 30 min after previous
              "2026-05-01 10:55:00", "2026-05-01 11:00:00"]
    rows = [(i, t, 7, "t", 1.0, None) for i, t in enumerate(stamps)]
    sf = _write_events(tmp_path, rows)
    out = sorted(get("q_sessionize").fn(spark, sf).collect(),
                 key=lambda r: r.session_id)
    assert [(r.n_events, r.duration_s) for r in out] == [
        (2, 600), (3, 599)]

    b = get("q_burstiness").fn(spark, sf).collect()[0]
    gaps = np.array([600, 2401, 299, 300], float) * 1e6   # micros
    n, sd, ssd = len(gaps), gaps.sum(), (gaps ** 2).sum()
    root = np.sqrt(n * ssd - sd * sd)
    want = (root - sd) / (root + sd)
    assert b.n_gaps == 4
    assert abs(b.mean_gap_s - round(sd / n / 1e6, 3)) < 1e-9
    assert abs(b.burstiness - want) < 1e-5


def test_time_weighted_avg_matches_direct(spark, tmp_path):
    # one stream: value 10 for 30 min, then 20 for 90 min (crossing an
    # hour boundary), final sentinel closes the last segment
    rows = [(0, "2026-06-01 10:00:00", 1, "t", 10.0, None),
            (1, "2026-06-01 10:30:00", 1, "t", 20.0, None),
            (2, "2026-06-01 12:00:00", 1, "t", 99.0, None)]
    out = {r.hour_bucket: r for r in
           get("q_time_weighted_avg").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    h0 = int(pd.Timestamp("2026-06-01 10:00:00").value // 1000
             // 3_600_000_000)
    # hour 10: 30 min at 10 + 30 min at 20 -> 15.0 over 3600 s
    r0 = out[h0]
    assert r0.total_us == 3_600_000_000
    assert abs(r0.twa - 15.0) < 1e-9
    # hour 11: full hour at 20
    r1 = out[h0 + 1]
    assert r1.total_us == 3_600_000_000
    assert abs(r1.twa - 20.0) < 1e-9


def test_skipgram_and_keyword_tfidf_match_direct(spark, tmp_path):
    texts = ["a b c d", "b c b"]
    sf = _write_docs(tmp_path, texts)
    out = {(r.center, r.context): r.c for r in
           get("q_skipgram_counts").fn(spark, sf).collect()}
    want = {}
    for t in texts:
        ws = t.split()
        for i, w in enumerate(ws):
            for o in (-2, -1, 1, 2):
                if 0 <= i + o < len(ws):
                    want[(w, ws[i + o])] = want.get((w, ws[i + o]), 0) + 1
    assert out == want   # tiny corpus: top-100 covers everything

    kw = {(r.doc_id, r.tok): r for r in
          get("q_keyword_tfidf").fn(spark, sf).collect()}
    # only doc_id % 25 == 0 docs are scored -> doc 0 here; top 3 by
    # (score desc, tok asc): a and d (df=1) beat b (df=2), c cut
    assert set(kw) == {(0, "a"), (0, "d"), (0, "b")}
    n = len(texts)
    df = {"a": 1, "b": 2, "c": 2, "d": 1}
    for (_, w), r in kw.items():
        want = 1 * (np.log((n + 1) / (df[w] + 1)) + 1)
        assert r.tf == 1 and r.df == df[w], w
        assert abs(r.tfidf - round(want, 6)) < 1e-5, w


def test_cms_count_matches_md5_mirror(spark, tmp_path):
    import hashlib

    texts = ["red red red blue blue green",
             "red blue yellow yellow pink"]
    sf = _write_docs(tmp_path, texts)
    out = {r.term: r for r in get("q_cms_count").fn(spark, sf).collect()}
    toks = [w for t in texts for w in t.lower().split()]
    exact = {w: toks.count(w) for w in set(toks)}

    def bucket(r, w):
        return int(hashlib.md5(f"{r}:{w}".encode()).hexdigest()[:3],
                   16) % 512
    cells = {}
    for w, c in exact.items():
        for r in range(4):
            key = (r, bucket(r, w))
            cells[key] = cells.get(key, 0) + c
    for w, r_out in out.items():
        est = min(cells[(r, bucket(r, w))] for r in range(4))
        assert r_out.c_exact == exact[w], w        # exact count column
        assert r_out.c_est == est, w               # the sketch readout
        assert r_out.c_est >= exact[w], w          # CMS never undercounts


def test_url_canonical_and_line_dedup_match_direct(spark, tmp_path):
    import hashlib
    import re as _re

    texts = [" ".join(f"t{j}" for j in range(25)) for _ in range(3)]
    # doc 3 is unique text; the three identical docs repeat every block
    texts.append("solo " * 12)
    sf = _write_docs(tmp_path, texts, sources=["sa", "sb", "sa", "sc"])

    out = {r.canonical_url: r for r in
           get("q_url_canonical").fn(spark, sf).collect()}

    def canon(doc_id, source):
        url = (("https" if doc_id % 2 == 0 else "HTTPS") + "://"
               + (source.upper() if doc_id % 3 == 0 else source)
               + ".Example.COM"
               + (":443" if doc_id % 4 == 0 else "")
               + "/a/./b/../docs/" + str(doc_id % 50)
               + (f"?utm_source=feed&ref={source}&id={doc_id % 50}"
                  if doc_id % 2 == 0 else f"?id={doc_id % 50}")
               + "#sec" + str(doc_id % 5))
        u = _re.sub(r"#.*$", "", url)
        head = _re.match(r"^([^/]*//[^/?#]*)", u).group(1)
        u = head.lower() + u[len(head):]
        u = _re.sub(r"^(https://[^/:]*):443", r"\1", u)
        u = _re.sub(r"/[^/]+/\.\./", "/", _re.sub(r"/\./", "/", u))
        u = _re.sub(r"[?&]$", "",
                    _re.sub(r"(utm_[a-z]+|ref)=[^&#]*&?", "", u))
        return u

    want = {}
    for i, src in enumerate(["sa", "sb", "sa", "sc"]):
        want.setdefault(canon(i, src), []).append(i)
    assert set(out) == set(want)
    for u, ids in want.items():
        assert out[u].n_variants == len(ids), u
        assert out[u].keep_id == min(ids), u

    ld = {r.doc_id: r for r in
          get("q_line_dedup").fn(spark, sf).collect()}

    def blocks(t):
        ws = [w for w in _re.split(r"\s+", t) if w]
        return [" ".join(ws[i:i + 10]) for i in range(0, len(ws), 10)]

    occ = {}
    for t in texts:
        for b in blocks(t):
            occ[b] = occ.get(b, 0) + 1
    for i, t in enumerate(texts):
        bs = blocks(t)
        kept = [b for b in bs if occ[b] < 3]
        assert ld[i].n_blocks == len(bs), i
        assert ld[i].n_removed == len(bs) - len(kept), i
        assert (ld[i].clean_text or "") == " ".join(kept), i
    # the 3x-repeated boilerplate blocks are gone; unique text survives
    assert not ld[0].clean_text and ld[3].clean_text


def test_hellinger_drift_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(211)
    a = rng.normal(0.0, 1.0, 500)    # reference window (before Jan 16)
    b = rng.normal(1.5, 1.0, 400)    # current window, planted shift
    rows = [(i, "2024-01-05", 0, "t", float(v), None)
            for i, v in enumerate(a)]
    rows += [(1000 + i, "2024-01-25", 0, "t", float(v), None)
             for i, v in enumerate(b)]
    sf = _write_events(tmp_path, rows)
    out = get("q_hellinger_drift").fn(spark, sf).collect()
    # numpy mirror of the exact binned construction (pico-quantized BC)
    allv = np.concatenate([a, b])
    mn, mx = allv.min(), allv.max()
    bins_a = np.minimum(19, np.maximum(0, np.floor(
        (a - mn) * 20.0 / (mx - mn)).astype(int)))
    bins_b = np.minimum(19, np.maximum(0, np.floor(
        (b - mn) * 20.0 / (mx - mn)).astype(int)))
    h_a = np.bincount(bins_a, minlength=20)
    h_b = np.bincount(bins_b, minlength=20)
    bc_pico = sum(int(np.floor(np.sqrt((h_a[k] / 500) * (h_b[k] / 400))
                               * 1e12 + 0.5)) for k in range(20))
    want_h = round(np.sqrt(max(0.0, 1.0 - bc_pico / 1e12)), 6)
    assert abs(out[0].hellinger - want_h) < 1e-9
    # the planted 1.5-sigma shift must be DETECTED as substantial drift
    assert out[0].hellinger > 0.4
    # identical windows -> H == 0
    rows_eq = [(2 * j + s, "2024-01-05" if s == 0 else "2024-01-25",
                0, "t", float(a[j]), None)
               for j in range(200) for s in (0, 1)]
    out0 = get("q_hellinger_drift").fn(
        spark, _write_events(tmp_path, rows_eq)).collect()
    assert out0[0].hellinger == 0.0 and out0[0].bhattacharyya == 0.0


def test_overdispersion_detects_clumping(spark, tmp_path):
    rng = np.random.RandomState(223)
    rows = []
    eid = 0
    # stream "pois": iid Poisson(60) daily counts -> D ~ 1, no flag
    for day in range(1, 29):
        for _ in range(int(rng.poisson(60))):
            rows.append((eid, f"2024-01-{day:02d}", 0, "pois", 1.0, None))
            eid += 1
    # stream "burst": mixture of quiet and 5x burst days -> D >> 1
    for day in range(1, 29):
        lam = 20 if day % 4 else 260
        for _ in range(int(rng.poisson(lam))):
            rows.append((eid, f"2024-01-{day:02d}", 0, "burst", 1.0, None))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = {r.event_type: r for r in
           get("q_overdispersion").fn(spark, sf).collect()}
    # numpy mirror of D on the Poisson stream
    pdf = pd.DataFrame(rows, columns=COLS)
    c = (pdf[pdf.event_type == "pois"].groupby("ts").size()).to_numpy()
    want_d = c.var(ddof=1) / c.mean()
    assert abs(out["pois"].dispersion - round(want_d, 6)) < 1e-9
    assert not out["pois"].overdispersed_95
    assert out["burst"].dispersion > 5
    assert out["burst"].overdispersed_95


def test_hosmer_lemeshow_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(227)
    n = 400
    labels = rng.randint(0, 10, n)
    vecs = [rng.randn(8).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, labels)
    rows = {r.bin: r for r in
            get("q_hosmer_lemeshow").fn(spark, sf).collect()}
    bins = {}
    for i in range(n):
        p_milli = 80 * labels[i] + ((i % 1000003) * 2654435761 % 1000) // 5
        b = min(p_milli // 100, 9)
        nn, sp, sy = bins.get(b, (0, 0, 0))
        bins[b] = (nn + 1, sp + p_milli, sy + (1 if labels[i] >= 5 else 0))
    total_nano = 0
    for b, (nn, sp, sy) in bins.items():
        e1 = sp / 1000.0
        t = (sy - e1) ** 2 / (e1 * (1 - sp / (1000.0 * nn)))
        t_nano = int(np.floor(t * 1e9 + 0.5))
        total_nano += t_nano
        assert rows[b].n == nn and rows[b].obs_pos == sy
        assert abs(rows[b].hl_term - round(t_nano / 1e9, 6)) < 1e-9
    assert abs(rows[0].hl_total - round(total_nano / 1e9, 6)) < 1e-9
    # the hash scorer's thresholded outcome (label>=5) is a known
    # miscalibration the gate must DETECT
    assert rows[0].reject_95


def test_hurst_exponent_separates_noise_from_walk(spark, tmp_path):
    rng = np.random.RandomState(229)
    n = 1024
    iid = rng.normal(50.0, 5.0, n)               # white noise: H ~ 0.5
    walk = 50.0 + np.cumsum(rng.normal(0, 0.5, n))  # random walk: H -> 1
    rows = [(i, "2024-01-01", 0, "iid", float(v), None)
            for i, v in enumerate(iid)]
    rows += [(10000 + i, "2024-01-01", 0, "walk", float(v), None)
             for i, v in enumerate(walk)]
    # unique timestamps preserve the series order via (ts, event_id)
    pdf = pd.DataFrame(rows, columns=COLS)
    pdf["ts"] = (pd.Timestamp("2024-01-01")
                 + pd.to_timedelta(pdf["event_id"] % 10000, unit="s"))
    pdf.to_parquet(tmp_path / "events.parquet", coerce_timestamps="us")
    out = {(r.event_type, r.m): r for r in
           get("q_hurst_exponent").fn(spark, str(tmp_path)).collect()}

    # numpy mirror of the exact integer R/S construction for one stream
    def rs_mean_nano(x_milli, m):
        vals = []
        for b in range(len(x_milli) // m):
            blk = x_milli[b * m:(b + 1) * m]
            s = int(blk.sum())
            cum = np.cumsum(blk)
            d = m * cum - np.arange(1, m + 1) * s
            s2 = m * int((blk.astype(object) ** 2).sum()) - s * s
            if s2 > 0:
                vals.append(int(np.floor(
                    (d.max() - d.min()) / np.sqrt(float(s2)) * 1e9 + 0.5)))
        return int(np.floor(sum(vals) / len(vals) + 0.5))

    x = np.floor(iid * 1000 + 0.5).astype(np.int64)
    r16, r64 = rs_mean_nano(x, 16), rs_mean_nano(x, 64)
    want_h = round((np.log(r64 / 1e9) - np.log(r16 / 1e9))
                   / 1.3862943611198906, 6)
    assert abs(out[("iid", 16)].hurst - want_h) < 1e-9
    assert abs(out[("iid", 16)].mean_rs - round(r16 / 1e9, 6)) < 1e-9
    # detection: the walk's long memory must separate cleanly
    assert 0.35 < out[("iid", 16)].hurst < 0.68
    assert out[("walk", 16)].hurst > out[("iid", 16)].hurst + 0.2
    assert out[("walk", 16)].hurst > 0.8


def test_cronbach_alpha_detects_consistency(spark, tmp_path):
    rng = np.random.RandomState(233)
    items = ["a", "b", "c", "d"]
    # consistent battery: each user's items = latent + small noise
    rows = []
    eid = 0
    for u in range(80):
        latent = rng.uniform(10, 100)
        for it in items:
            rows.append((eid, "2024-01-05", u, it,
                         float(latent + rng.normal(0, 3)), None))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = get("q_cronbach_alpha").fn(spark, sf).collect()
    # numpy mirror: one event per cell -> cell mean == value (nano ints)
    pdf = pd.DataFrame(rows, columns=COLS)
    m = {}
    for r in pdf.itertuples():
        micro = int(np.floor(r.value * 1e6 + 0.5))
        m[(r.user_id, r.event_type)] = int(
            np.floor(micro * 1000.0 + 0.5))
    mat = np.array([[m[(u, it)] for it in items] for u in range(80)],
                   dtype=float)
    k = len(items)
    want = k / (k - 1) * (1 - mat.var(axis=0, ddof=1).sum()
                          / mat.sum(axis=1).var(ddof=1))
    assert out[0].k == k and out[0].n_cases == 80
    assert abs(out[0].alpha - round(want, 6)) < 1e-5
    assert out[0].alpha > 0.9  # the planted shared construct

    # unrelated items -> alpha near 0 (fresh dir: the query's CacheSlot
    # keys on the logical plan, and overwriting the same path would
    # legitimately serve the cached first-case cells)
    rows2 = [(i * 4 + j, "2024-01-05", i, it,
              float(rng.uniform(10, 100)), None)
             for i in range(80) for j, it in enumerate(items)]
    d2 = tmp_path / "b"
    d2.mkdir()
    out2 = get("q_cronbach_alpha").fn(
        spark, _write_events(d2, rows2)).collect()
    assert out2[0].alpha < 0.45


def test_map_eval_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(239)
    n = 300
    labels = rng.randint(0, 10, n)
    vecs = [rng.randn(8).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, labels)
    rows = {r.qid: r for r in get("q_map_eval").fn(spark, sf).collect()}
    aps = []
    for qid in range(20):
        members = [(round(float(vecs[i][0]), 6), i,
                    1 if labels[i] >= 7 else 0)
                   for i in range(n) if i % 20 == qid]
        members.sort(key=lambda t: (-t[0], t[1]))
        n_rel = sum(rel for _, _, rel in members)
        hits = 0
        num = 0  # exact lcm-2520 integer numerator
        for rk, (_, _, rel) in enumerate(members[:10], start=1):
            hits += rel
            if rel:
                num += hits * (2520 // rk)
        r = rows[qid]
        assert r.n_rel == n_rel, qid
        if n_rel == 0:
            assert r.ap is None
        else:
            want = round(num / (2520.0 * min(n_rel, 10)), 9)
            assert abs(r.ap - want) < 1e-12, qid
            aps.append(want)
    assert abs(rows[0].map - round(np.mean(aps), 6)) < 1e-9
    # a perfect ranker must score MAP == 1: score = relevance signal
    vecs2 = [np.array([1.0 if labels[i] >= 7 else 0.0] * 8, np.float32)
             for i in range(n)]
    sf2 = _write_embeddings(tmp_path, vecs2, labels)
    rows2 = get("q_map_eval").fn(spark, sf2).collect()
    for r in rows2:
        if r.n_rel and r.n_rel <= 10:
            assert r.ap == 1.0, r.qid


def test_rbo_overlap_matches_direct(spark, tmp_path):
    rng = np.random.RandomState(241)
    n = 300
    labels = rng.randint(0, 10, n)
    # identical rankers -> RBO == 1 everywhere
    vecs_same = [np.array([v, v, 0, 0], np.float32)
                 for v in rng.randn(n)]
    sf = _write_embeddings(tmp_path, vecs_same, labels)
    for r in get("q_rbo_overlap").fn(spark, sf).collect():
        assert r.rbo == 1.0 and r.rbo_mean == 1.0

    # independent rankers: mirror the exact integer formula
    vecs = [rng.randn(4).astype(np.float32) for _ in range(n)]
    sf2 = _write_embeddings(tmp_path, vecs, labels)
    rows = {r.qid: r for r in
            get("q_rbo_overlap").fn(spark, sf2).collect()}
    w_nano = [1000000000, 900000000, 810000000, 729000000, 656100000,
              590490000, 531441000, 478296900, 430467210, 387420489]
    for qid in range(20):
        ids = [i for i in range(n) if i % 20 == qid]
        ra = sorted(ids, key=lambda i: (-round(float(vecs[i][0]), 6), i))
        rb = sorted(ids, key=lambda i: (-round(float(vecs[i][1]), 6), i))
        num = 0
        for d in range(1, 11):
            ov = len(set(ra[:d]) & set(rb[:d]))
            num += w_nano[d - 1] * ov * (2520 // d)
        want = round(num / (2520.0 * 6513215599), 9)
        assert abs(rows[qid].rbo - want) < 1e-12, qid
        ov10 = len(set(ra[:10]) & set(rb[:10]))
        assert rows[qid].ov10 == ov10, qid


def test_energy_distance_matches_bruteforce(spark, tmp_path):
    rng = np.random.RandomState(251)
    a = rng.normal(10.0, 2.0, 200)   # reference window
    b = rng.normal(13.0, 3.0, 150)   # planted location+scale shift
    rows = [(i, "2024-01-05", 0, "t", float(v), None)
            for i, v in enumerate(a)]
    rows += [(1000 + i, "2024-01-25", 0, "t", float(v), None)
             for i, v in enumerate(b)]
    out = get("q_energy_distance").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    # brute-force O(n*m) mirror on the micro-quantized values
    au = np.floor(a * 1e6 + 0.5).astype(np.int64)
    bu = np.floor(b * 1e6 + 0.5).astype(np.int64)
    cross = np.abs(au[:, None] - bu[None, :]).sum()
    wa = np.abs(au[:, None] - au[None, :]).sum()
    wb = np.abs(bu[:, None] - bu[None, :]).sum()
    A = cross / (200 * 150) / 1e6
    B = wa / (200 * 200) / 1e6
    C = wb / (150 * 150) / 1e6
    assert out.n_ref == 200 and out.n_cur == 150
    assert abs(out.mean_cross - round(A, 6)) < 1e-9
    assert abs(out.mean_within_ref - round(B, 6)) < 1e-9
    assert abs(out.mean_within_cur - round(C, 6)) < 1e-9
    assert abs(out.energy_dist - round(2 * A - B - C, 6)) < 1e-9
    assert out.energy_dist > 1.0  # the planted shift must register
    # identical windows -> E == 0
    rows_eq = [(2 * j + s, "2024-01-05" if s == 0 else "2024-01-25",
                0, "t", float(a[j]), None)
               for j in range(200) for s in (0, 1)]
    out0 = get("q_energy_distance").fn(
        spark, _write_events(tmp_path, rows_eq)).collect()[0]
    assert out0.energy_dist == 0.0 and out0.e_coeff == 0.0


def test_embedding_drift_localizes_planted_subspace(spark, tmp_path):
    rng = np.random.RandomState(257)
    n = 400
    vecs = []
    for i in range(n):
        v = rng.normal(0, 1, 16)
        if i % 2 == 1:        # current cohort: drift in dims 3 and 7
            v[2] += 2.0
            v[6] -= 1.5
        vecs.append(v.astype(np.float32))
    sf = _write_embeddings(tmp_path, vecs, rng.randint(0, 10, n))
    rows = {r.dim: r for r in
            get("q_embedding_drift").fn(spark, sf).collect()}
    # numpy mirror of the micro-int means and pico-quantized gaps
    arr = np.array([np.floor(v.astype(np.float64) * 1e6 + 0.5)
                    for v in vecs])
    mu_a = arr[0::2].mean(axis=0) / 1e6
    mu_b = arr[1::2].mean(axis=0) / 1e6
    g2 = np.array([int(np.floor((mu_a[d] - mu_b[d]) ** 2 * 1e12 + 0.5))
                   for d in range(16)])
    for d in range(16):
        assert abs(rows[d + 1].gap_sq - round(g2[d] / 1e12, 9)) < 1e-12
    assert abs(rows[1].mmd - round(np.sqrt(g2.sum() / 1e12), 6)) < 1e-9
    # the two planted dimensions must dominate the breakdown
    top2 = sorted(rows.values(), key=lambda r: -r.gap_sq)[:2]
    assert {t.dim for t in top2} == {3, 7}
    assert rows[1].mmd > 2.0  # sqrt(2^2 + 1.5^2) = 2.5 planted


def test_ab_srm_detects_broken_bucketing(spark, tmp_path):
    def arm(u):
        return 0 if ((u % 1000003) * 2654435761 % 1000) < 500 else 1

    # balanced: 300 users straight through the hash -> no SRM
    rows = [(i, "2024-01-05", u, "exp", 1.0, None)
            for i, u in enumerate(range(300))]
    out = {r.event_type: r for r in
           get("q_ab_srm").fn(spark, _write_events(tmp_path, rows)).collect()}
    n_a = sum(1 for u in range(300) if arm(u) == 0)
    assert out["exp"].n_a == n_a and out["exp"].n_b == 300 - n_a
    want = (2 * n_a - 300) ** 2 / 300
    assert abs(out["exp"].chi2 - round(want, 6)) < 1e-9
    assert not out["exp"].srm_95

    # broken bucketing: a logging bug drops most of arm B's users
    a_pool = [u for u in range(300) if arm(u) == 0]
    b_pool = [u for u in range(300) if arm(u) == 1][:60]
    kept = a_pool + b_pool
    rows2 = [(i, "2024-01-05", u, "exp", 1.0, None)
             for i, u in enumerate(kept)]
    d2 = tmp_path / "b"
    d2.mkdir()
    out2 = {r.event_type: r for r in
            get("q_ab_srm").fn(spark, _write_events(d2, rows2)).collect()}
    assert out2["exp"].n_a == len(a_pool) and out2["exp"].n_b == 60
    assert out2["exp"].srm_95  # ~(149-60)^2/209 = 37.9 >> 3.84


def test_theils_u2_separates_trend_from_noise(spark, tmp_path):
    rng = np.random.RandomState(263)
    rows = []
    # "trend": strong drift + small noise -> Holt beats naive (u2 < 1)
    for d in range(30):
        for j in range(3):
            rows.append((d * 10 + j, f"2024-01-{d + 1:02d}", 0, "trend",
                         float(10 * d + rng.normal(0, 0.5)), None))
    # "noise": iid white noise -> naive is near-unbeatable
    for d in range(30):
        for j in range(3):
            rows.append((1000 + d * 10 + j, f"2024-01-{d + 1:02d}", 0,
                         "noise", float(rng.normal(50, 10)), None))
    out = {r.event_type: r for r in
           get("q_theils_u2").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    # numpy mirror of the exact fold for the trend stream
    pdf = pd.DataFrame(rows, columns=COLS)
    pdf["mu"] = np.floor(pdf.value * 1e6 + 0.5)
    daily = (pdf[pdf.event_type == "trend"].groupby("ts")["mu"]
             .agg(["sum", "count"]))
    mus = np.floor(daily["sum"] / daily["count"] + 0.5).astype(np.int64)
    l, b, prev = float(mus.iloc[1]), float(mus.iloc[1] - mus.iloc[0]), \
        float(mus.iloc[1])
    sm = sn = 0.0
    for x in mus.iloc[2:]:
        x = float(x)
        sm += ((l + b) - x) ** 2
        sn += (prev - x) ** 2
        l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l, prev = l2, x
    assert abs(out["trend"].theils_u2
               - round(np.sqrt(sm / sn), 6)) < 1e-9
    assert out["trend"].beats_naive and out["trend"].theils_u2 < 0.75
    assert out["noise"].theils_u2 > 0.9


def test_sax_symbols_encodes_planted_shape(spark, tmp_path):
    # 30 days: 10 low, 10 high, 10 low -> blocks aa dd aa
    rows = []
    for d in range(30):
        v = 100.0 if 10 <= d < 20 else 10.0
        rows.append((d, f"2024-01-{d + 1:02d}", 0, "sq", v, None))
    out = get("q_sax_symbols").fn(
        spark, _write_events(tmp_path, rows)).collect()
    assert len(out) == 1
    assert out[0].n_blocks == 6
    assert out[0].sax == "aaddaa"


def test_newey_west_corrects_autocorrelated_series(spark, tmp_path):
    rng = np.random.RandomState(271)
    n = 800
    # AR(1) with phi = 0.7: strongly positively autocorrelated
    ar = np.zeros(n)
    for i in range(1, n):
        ar[i] = 0.7 * ar[i - 1] + rng.normal(0, 1)
    iid = rng.normal(0, 1, n)
    rows = [(i, "2024-01-01", 0, "ar", float(50 + v), None)
            for i, v in enumerate(ar)]
    rows += [(10000 + i, "2024-01-01", 0, "iid", float(50 + v), None)
             for i, v in enumerate(iid)]
    pdf = pd.DataFrame(rows, columns=COLS)
    pdf["ts"] = (pd.Timestamp("2024-01-01")
                 + pd.to_timedelta(pdf["event_id"] % 10000, unit="s"))
    pdf.to_parquet(tmp_path / "events.parquet", coerce_timestamps="us")
    out = {r.event_type: r for r in
           get("q_newey_west").fn(spark, str(tmp_path)).collect()}

    # numpy mirror of the exact construction for the AR stream
    x = np.floor((50 + ar) * 1e6 + 0.5).astype(object)
    d = n * x - x.sum()
    ss = float((d * d).sum())
    rho = [round(float((d[k:] * d[:-k]).sum()) / ss * 1e12) / 1e12
           for k in (1, 2, 3)]
    var_iid = ss / (n * n * (n - 1)) / 1e12
    kern = 1 + 2 * (0.75 * rho[0] + 0.5 * rho[1] + 0.25 * rho[2])
    assert abs(out["ar"].se_iid - round(np.sqrt(var_iid / n), 6)) < 1e-9
    assert abs(out["ar"].se_hac
               - round(np.sqrt(var_iid * kern / n), 6)) < 1e-9
    assert abs(out["ar"].n_eff
               - round(n / (1 + 2 * sum(rho)), 1)) < 1e-9
    # detection: phi=0.7 must inflate the error bar and shrink n_eff
    assert out["ar"].se_ratio > 1.4
    assert out["ar"].n_eff < n / 2
    assert 0.85 < out["iid"].se_ratio < 1.15
    assert out["iid"].n_eff > 0.7 * n


def test_gumbel_fit_recovers_planted_distribution(spark, tmp_path):
    rng = np.random.RandomState(277)
    mu_true, beta_true = 100.0, 5.0
    n_days = 600
    maxima = mu_true - beta_true * np.log(-np.log(rng.uniform(size=n_days)))
    # one event per day: the daily max IS the planted Gumbel draw
    rows = []
    for d in range(n_days):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
        rows.append((d, str(ts), 0, "g", float(maxima[d]), None))
    out = get("q_gumbel_fit").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    # numpy mirror of the exact micro-int moment construction
    x = np.floor(maxima * 1e6 + 0.5)
    beta_u = x.std(ddof=1) * np.sqrt(6) / np.pi
    mu_u = x.mean() - 0.5772156649015329 * beta_u
    assert out.n_blocks == n_days
    assert abs(out.gumbel_mu - round(mu_u / 1e6, 6)) < 2e-6
    assert abs(out.gumbel_beta - round(beta_u / 1e6, 6)) < 2e-6
    # parameter recovery of the planted distribution
    assert abs(out.gumbel_mu - mu_true) < 1.0
    assert abs(out.gumbel_beta - beta_true) < 0.8
    # return levels are monotone and beyond the fitted location
    assert out.return_level_1000 > out.return_level_100 > out.gumbel_mu
    # the 100-day level should be near mu + beta*ln(-ln(0.99))^-1 ~ mu+4.6b
    want_rl = mu_u / 1e6 - beta_u / 1e6 * np.log(-np.log(0.99))
    assert abs(out.return_level_100 - round(want_rl, 6)) < 2e-5


def test_shapley_attribution_matches_bruteforce(spark, tmp_path):
    """Exact Shapley against a brute-force over all 4! channel
    orderings on a planted touch scenario; plus the efficiency
    property sum(phi) = v(full) - v(empty)."""
    import itertools

    CH = ["click", "view", "signup", "error"]
    # planted touch sets (channels before the first purchase)
    scenarios = [("click",), ("click", "view"), ("view",),
                 ("click", "view"), (), ("signup", "click", "view"),
                 ("error",), ("view", "signup")]
    rows = []
    eid = 0
    for u, touches in enumerate(scenarios):
        for j, t in enumerate(touches):
            rows.append((eid, f"2024-01-0{j + 1}", u, t, 1.0, None))
            eid += 1
        rows.append((eid, "2024-01-09", u, "purchase", 1.0, None))
        eid += 1
        # post-purchase touches must NOT count
        rows.append((eid, "2024-01-10", u, "error", 1.0, None))
        eid += 1
    out = {r.channel: r for r in
           get("q_shapley_attribution").fn(
               spark, _write_events(tmp_path, rows)).collect()}

    sets = [frozenset(t) for t in scenarios]

    def v(coal):
        return sum(1 for t in sets if t <= coal)

    phi = dict.fromkeys(CH, 0.0)
    for perm in itertools.permutations(CH):
        coal = set()
        for c in perm:
            before = v(frozenset(coal))
            coal.add(c)
            phi[c] += (v(frozenset(coal)) - before) / 24.0
    for c in CH:
        assert abs(out[c].shapley - round(phi[c], 6)) < 1e-9, c
    total = sum(phi.values())
    assert abs(total - (v(frozenset(CH)) - v(frozenset()))) < 1e-9
    for c in CH:
        assert abs(out[c].share - round(phi[c] / total, 6)) < 1e-9, c


def test_ratio_delta_matches_numpy_and_detects_lift(spark, tmp_path):
    def arm(u):
        return 0 if ((u % 1000003) * 2654435761 % 1000) < 500 else 1

    rng = np.random.RandomState(281)
    rows = []
    eid = 0
    # planted: arm B clicks ~40% more per view
    for u in range(400):
        views = int(rng.poisson(20)) + 1
        rate = 0.30 if arm(u) == 0 else 0.42
        clicks = int(rng.binomial(views, rate))
        for _ in range(views):
            rows.append((eid, "2024-01-05", u, "view", 1.0, None))
            eid += 1
        for _ in range(clicks):
            rows.append((eid, "2024-01-05", u, "click", 1.0, None))
            eid += 1
    out = get("q_ratio_delta").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]

    pdf = pd.DataFrame(rows, columns=COLS)
    per = (pdf.assign(is_c=(pdf.event_type == "click").astype(int),
                      is_v=(pdf.event_type == "view").astype(int))
           .groupby("user_id")[["is_c", "is_v"]].sum())

    def delta(users):
        x = per.loc[users, "is_c"].to_numpy(float)
        y = per.loc[users, "is_v"].to_numpy(float)
        n, r = len(x), x.sum() / y.sum()
        var = (x.var(ddof=1) + r * r * y.var(ddof=1)
               - 2 * r * np.cov(x, y, ddof=1)[0, 1]) / y.mean() ** 2 / n
        return n, r, var

    na, ra, va = delta([u for u in per.index if arm(u) == 0])
    nb, rb, vb = delta([u for u in per.index if arm(u) == 1])
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.ratio_a - round(ra, 6)) < 1e-9
    assert abs(out.ratio_b - round(rb, 6)) < 1e-9
    assert abs(out.se_diff - round(np.sqrt(va + vb), 6)) < 1e-6
    assert abs(out.z - round((rb - ra) / np.sqrt(va + vb), 6)) < 1e-4
    # the planted 12-point lift must be detected
    assert out.significant_95 and out.z > 3


def test_holt_winters_matches_numpy_and_learns_weekly_shape(spark, tmp_path):
    rng = np.random.RandomState(283)
    season = [0.0, 10.0, 20.0, 30.0, 20.0, 10.0, 0.0]  # weekly shape
    rows = []
    for d in range(28):
        v = 100.0 + season[d % 7] + rng.normal(0, 0.5)
        rows.append((d, str(pd.Timestamp("2024-01-01")
                            + pd.Timedelta(days=d)), 0, "hw",
                     float(v), None))
    out = get("q_holt_winters").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    # numpy sequential mirror of the exact fold
    pdf = pd.DataFrame(rows, columns=COLS)
    mus = np.floor(np.floor(pdf.value * 1e6 + 0.5) + 0.5).astype(np.int64)
    l = mus[:7].sum() / 7.0
    b = (mus[7:14].sum() / 7.0 - mus[:7].sum() / 7.0) / 7.0
    s = [float(mus[i]) - l for i in range(7)]
    for t in range(7, 28):            # absolute rk = t+1
        pos = ((t + 1) - 1) % 7
        s_old = s[pos]
        l_new = 0.5 * (mus[t] - s_old) + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        s[pos] = 0.5 * (mus[t] - l_new) + 0.5 * s_old
        l = l_new
    s_next = s[28 % 7]
    assert out.n_days == 28
    assert abs(out.level - round(l / 1e6, 6)) < 1e-9
    assert abs(out.trend - round(b / 1e6, 6)) < 1e-9
    assert abs(out.s_next - round(s_next / 1e6, 6)) < 1e-9
    assert abs(out.forecast_1 - round((l + b + s_next) / 1e6, 6)) < 1e-9
    # the learned seasonal for day 29 (a Monday-slot, season 0) must be
    # clearly below the mid-week peak: the weekly shape was captured
    peak = max(s) / 1e6
    assert out.s_next < peak - 10
    # forecast for the low-season day sits near 100, not near 130
    assert abs(out.forecast_1 - 100.0) < 6.0


def test_cohort_ltv_matches_direct(spark, tmp_path):
    # two cohorts: week of Jan 1 (Mon) and week of Jan 8
    rows = []
    eid = 0
    # cohort A: users 0,1 first seen Jan 2; purchases over 3 weeks
    for u, spend in ((0, [10.0, 20.0, 0.0]), (1, [0.0, 40.0, 5.0])):
        rows.append((eid, "2024-01-02", u, "view", 1.0, None))
        eid += 1
        for w, v in enumerate(spend):
            if v:
                ts = (pd.Timestamp("2024-01-02")
                      + pd.Timedelta(weeks=w)).strftime("%Y-%m-%d")
                rows.append((eid, ts, u, "purchase", v, None))
                eid += 1
    # cohort B: user 2 first seen Jan 10, one purchase that week
    rows.append((eid, "2024-01-10", 2, "view", 1.0, None))
    eid += 1
    rows.append((eid, "2024-01-11", 2, "purchase", 7.5, None))
    out = {(r.cohort_week, r.week_offset): r for r in
           get("q_cohort_ltv").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    a = "2024-01-01"
    assert out[(a, 0)].cohort_size == 2
    assert abs(out[(a, 0)].week_revenue - 10.0) < 1e-9
    assert abs(out[(a, 0)].ltv - 5.0) < 1e-9          # 10 / 2 users
    assert abs(out[(a, 1)].week_revenue - 60.0) < 1e-9
    assert abs(out[(a, 1)].ltv - 35.0) < 1e-9         # (10+60)/2
    assert abs(out[(a, 2)].ltv - 37.5) < 1e-9         # (10+60+5)/2
    b = "2024-01-08"
    assert out[(b, 0)].cohort_size == 1
    assert abs(out[(b, 0)].ltv - 7.5) < 1e-9


def test_rmst_matches_direct_km_area(spark, tmp_path):
    """RMST against a direct KM step-integral on a planted censored
    sample: 10 users, events at known day offsets, two censored."""
    rows = []
    eid = 0
    event_days = [1, 1, 2, 4, 6, 9, 12, 20]   # first purchase offsets
    for u, d in enumerate(event_days):
        rows.append((eid, "2024-01-01", u, "view", 1.0, None))
        eid += 1
        ts = (pd.Timestamp("2024-01-01")
              + pd.Timedelta(days=d)).strftime("%Y-%m-%d")
        rows.append((eid, ts, u, "purchase", 1.0, None))
        eid += 1
    for u in (90, 91):                         # censored at the edge
        rows.append((eid, "2024-01-01", u, "view", 1.0, None))
        eid += 1
    # observation edge (tmax) = the latest event day = Jan 21
    out = get("q_rmst").fn(spark, _write_events(tmp_path, rows)).collect()[0]

    # direct KM on durations: events at their day, censored at 20
    durs = sorted([(d, 1) for d in event_days] + [(20, 0), (20, 0)])
    n_risk, s, steps = len(durs), 1.0, []
    from itertools import groupby
    for day, grp in groupby(durs, key=lambda t: t[0]):
        grp = list(grp)
        d_ev = sum(1 for _, e in grp if e)
        if d_ev and d_ev < n_risk:
            s *= (1 - d_ev / n_risk)
        elif d_ev and d_ev == n_risk:
            s = 0.0
        steps.append((day, s))
        n_risk -= len(grp)

    def rmst(tau):
        area, prev_d, prev_s = 0.0, 0, 1.0
        for day, sv in steps:
            area += prev_s * (min(day, tau) - min(prev_d, tau))
            prev_d, prev_s = day, sv
        area += prev_s * max(tau - prev_d, 0)
        return area

    assert out.n_users == 10
    assert abs(out.rmst_7 - round(rmst(7), 6)) < 1e-5
    assert abs(out.rmst_14 - round(rmst(14), 6)) < 1e-5
    assert out.rmst_14 > out.rmst_7  # the area is monotone in tau


def test_bland_altman_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(293)
    n = 400
    labels = rng.randint(0, 10, n)
    vecs = [rng.randn(4).astype(np.float32) for _ in range(n)]
    sf = _write_embeddings(tmp_path, vecs, labels)
    out = get("q_bland_altman").fn(spark, sf).collect()[0]
    a = np.array([80 * labels[i] + ((i % 1000003) * 2654435761 % 1000) // 5
                  for i in range(n)], dtype=np.int64)
    b = np.array([80 * labels[i]
                  + (((i + 7) % 1000003) * 2654435761 % 1000) // 5
                  for i in range(n)], dtype=np.int64)
    d = (a - b) / 1000.0
    assert out.n == n
    assert abs(out.bias - round(d.mean(), 6)) < 1e-9
    assert abs(out.sd_diff - round(d.std(ddof=1), 6)) < 1e-6
    assert abs(out.loa_lower
               - round(d.mean() - 1.959964 * d.std(ddof=1), 6)) < 1e-5
    assert abs(out.frac_a_higher - round((a >= b).mean(), 6)) < 1e-9
    # the two hash scorers share the label term: bias ~ 0, narrow LoA
    assert abs(out.bias) < 0.05 and out.loa_upper < 0.5


def test_rmst_arms_detects_planted_delay(spark, tmp_path):
    """Arm B's first purchases are planted 9 days later than arm A's:
    the RMST difference must price that gap in days."""
    def arm(u):
        return 0 if ((u % 1000003) * 2654435761 % 1000) < 500 else 1

    rows = []
    eid = 0
    for u in range(60):
        rows.append((eid, "2024-01-01", u, "view", 1.0, None))
        eid += 1
        delay = 1 if arm(u) == 0 else 10
        ts = (pd.Timestamp("2024-01-01")
              + pd.Timedelta(days=delay)).strftime("%Y-%m-%d")
        rows.append((eid, ts, u, "purchase", 1.0, None))
        eid += 1
    # push the observation horizon past day 14
    rows.append((eid, "2024-01-20", 0, "view", 1.0, None))
    out = get("q_rmst_arms").fn(
        spark, _write_events(tmp_path, rows)).collect()[0]
    assert out.n_a + out.n_b == 60
    # deterministic step curves: everyone in an arm buys at one delay,
    # so RMST(14) = delay exactly
    assert abs(out.rmst14_a - 1.0) < 1e-9
    assert abs(out.rmst14_b - 10.0) < 1e-9
    assert abs(out.rmst_diff - 9.0) < 1e-9


# ---------------------------------------------------------------------------
# Round-13 additions: Kendall tau-b, BH step-up, Krippendorff alpha,
# split-conformal interval, Weibull linearized fit
# ---------------------------------------------------------------------------


def _write_orders_lineitem(tmp_path, orders_rows, lineitem_rows):
    pd.DataFrame(orders_rows).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(lineitem_rows).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_kendall_tau_matches_bruteforce(spark, tmp_path):
    """tau-b against an O(n^2) brute force on the bucketed pairs, with
    a planted positive association in one group and a planted negative
    one in the other."""
    rng = np.random.RandomState(17)
    orders, lines = [], []
    data = {}
    ok = 0
    for pri, sign in (("1-URGENT", +1), ("5-LOW", -1)):
        xs, ys = [], []
        for _ in range(180):
            nl = int(rng.randint(1, 8))
            base = nl if sign > 0 else (8 - nl)
            price = float(base * 23000 + rng.randint(0, 15000))
            orders.append({"o_orderkey": ok, "o_orderpriority": pri,
                           "o_totalprice": price})
            lines += [{"l_orderkey": ok}] * nl
            xs.append(int(price // 20000))
            ys.append(nl)
            ok += 1
        data[pri] = (np.array(xs), np.array(ys))
    sf = _write_orders_lineitem(tmp_path, orders, lines)
    out = {r.pri: r for r in
           get("q_kendall_tau").fn(spark, sf).collect()}
    for pri, (xs, ys) in data.items():
        n = len(xs)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = np.sign(xs[i] - xs[j]) * np.sign(ys[i] - ys[j])
                conc += s > 0
                disc += s < 0
        n0 = n * (n - 1) / 2
        n1 = sum(t * (t - 1) / 2 for t in np.bincount(xs) if t > 1)
        n2 = sum(t * (t - 1) / 2 for t in np.bincount(ys) if t > 1)
        tau = (conc - disc) / np.sqrt((n0 - n1) * (n0 - n2))
        assert out[pri].n == n
        assert abs(out[pri].kendall_tau - round(tau, 6)) < 1e-9, pri
        assert np.sign(out[pri].kendall_tau) == (1 if pri == "1-URGENT"
                                                 else -1)


def test_benjamini_hochberg_matches_numpy_and_flags_planted(
        spark, tmp_path):
    """The step-up rejection set equals a direct numpy BH on the same
    rounded pseudo-p's, and exactly the two planted shifted cells are
    rejected at q=0.10."""
    rng = np.random.RandomState(23)
    rows = []
    # SYMMETRIC planted drifts (+/-) so the global mean stays centered
    # and the null cells' one-sample z keeps its null distribution
    shifted = {(3, "A"): +0.02, (7, "R"): -0.02}
    for month in range(1, 13):
        for flag in ("A", "N", "R"):
            n = 220
            base = rng.normal(0.05, 0.01, n)
            base = base + shifted.get((month, flag), 0.0)
            for v in np.round(np.clip(base, 0.0, 0.10), 2):
                rows.append({"l_shipdate":
                             pd.Timestamp(f"2024-{month:02d}-15"),
                             "l_returnflag": flag,
                             "l_discount": float(v)})
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet",
                                  coerce_timestamps="us")
    out = get("q_benjamini_hochberg").fn(spark, str(tmp_path)).collect()
    assert len(out) == 36

    # numpy twin on the same centi-quantized moments
    df = pd.DataFrame(rows)
    df["centi"] = np.round(df["l_discount"] * 100).astype(np.int64)
    ng, sg, s2g = len(df), df["centi"].sum(), (df["centi"] ** 2).sum()
    mu, var = sg / ng, s2g / ng - (sg / ng) ** 2
    ps = {}
    for (m, f), g in df.groupby(
            [df["l_shipdate"].dt.month, "l_returnflag"]):
        z = (g["centi"].mean() - mu) / np.sqrt(var / len(g))
        ps[(m, f)] = round(float(np.exp(-z * z / 2)), 9)
    order = sorted(ps, key=lambda k: (ps[k], k))
    m = len(order)
    kstar = max((i + 1 for i, key in enumerate(order)
                 if ps[key] <= (i + 1) * 0.10 / m), default=0)
    want_rejected = set(order[:kstar])
    got_rejected = {(int(r.ship_month), r.returnflag)
                    for r in out if r.rejected}
    assert got_rejected == want_rejected
    assert got_rejected == set(shifted)  # exactly the planted cells
    for r in out:
        assert abs(r.p_tilde - ps[(int(r.ship_month), r.returnflag)]) \
            < 1e-9


def test_krippendorff_alpha_matches_direct(spark, tmp_path):
    """alpha against the direct coincidence formula, with a planted
    perfect-agreement group (alpha == 1) and a mixed group."""
    rng = np.random.RandomState(31)
    orders, lines = [], []
    ratings = {}
    ok = 0
    for pri, perfect in (("1-URGENT", True), ("5-LOW", False)):
        ratings[pri] = []
        for _ in range(120):
            m = int(rng.randint(2, 6))
            if perfect:
                cats = [rng.choice(["A", "N", "R"])] * m
            else:
                cats = list(rng.choice(["A", "N", "R"], m))
            orders.append({"o_orderkey": ok, "o_orderpriority": pri})
            lines += [{"l_orderkey": ok, "l_returnflag": c}
                      for c in cats]
            ratings[pri].append(cats)
            ok += 1
    sf = _write_orders_lineitem(tmp_path, orders, lines)
    out = {r.pri: r for r in
           get("q_krippendorff_alpha").fn(spark, sf).collect()}
    for pri, units in ratings.items():
        so, n_tot, margins = 0.0, 0, {}
        for cats in units:
            mcnt = len(cats)
            counts = pd.Series(cats).value_counts()
            so += (mcnt ** 2 - (counts ** 2).sum()) / (mcnt - 1)
            n_tot += mcnt
            for c, k in counts.items():
                margins[c] = margins.get(c, 0) + k
        denom = n_tot ** 2 - sum(v ** 2 for v in margins.values())
        alpha = 1 - (n_tot - 1) * so / denom
        assert out[pri].n_units == len(units)
        assert out[pri].n_ratings == n_tot
        assert abs(out[pri].alpha - round(alpha, 6)) < 2e-6, pri
    assert out["1-URGENT"].alpha == 1.0
    assert out["5-LOW"].alpha < 0.2


def test_conformal_interval_matches_numpy(spark, tmp_path):
    """q_hat is exactly the ceil((n+1)*0.8)-th smallest calibration
    residual and the reported coverage equals the direct count; on
    exchangeable data coverage lands near the 80% guarantee."""
    rng = np.random.RandomState(37)
    rows, eid = [], 0
    cal, test = {}, {}
    for et, scale in (("click", 1.0), ("view", 3.0)):
        cal[et] = np.round(rng.normal(10.0, scale, 300), 4)
        test[et] = np.round(rng.normal(10.0, scale, 200), 4)
        for v in cal[et]:
            rows.append((eid, "2024-01-05", eid, et, float(v), None))
            eid += 1
        for v in test[et]:
            rows.append((eid, "2024-01-20", eid, et, float(v), None))
            eid += 1
    out = {r.event_type: r for r in
           get("q_conformal_interval").fn(
               spark, _write_events(tmp_path, rows)).collect()}
    for et in cal:
        mu_nano = round(np.round(cal[et] * 1e9).sum() / len(cal[et]))
        scores = np.sort(np.abs(np.round(cal[et] * 1e9) - mu_nano))
        k = min(int(np.ceil((len(cal[et]) + 1) * 0.8)), len(cal[et]))
        q_nano = scores[k - 1]
        t_scores = np.abs(np.round(test[et] * 1e9) - mu_nano)
        cov = (t_scores <= q_nano).mean()
        assert out[et].n_cal == 300 and out[et].n_test == 200
        assert abs(out[et].q_hat - round(q_nano / 1e9, 9)) < 1e-12, et
        assert abs(out[et].coverage - round(cov, 6)) < 1e-9, et
        assert 0.72 <= out[et].coverage <= 0.92  # the 80% guarantee


def test_weibull_fit_recovers_planted_shape(spark, tmp_path):
    """Planted (approximately) Weibull conversion times: exponential
    durations (shape 1) and wear-out durations (shape 2) recover their
    shapes from the linearized KM regression; the slope also matches a
    direct numpy least squares on the same micro-quantized points."""
    for shape, lo, hi in ((1.0, 0.75, 1.35), (2.0, 1.6, 2.6)):
        rng = np.random.RandomState(41 + int(shape))
        d = tmp_path / f"shape{int(shape)}"
        d.mkdir()
        rows, eid = [], 0
        t0 = pd.Timestamp("2024-01-01")
        durs = np.ceil(12.0 * rng.weibull(shape, 600)).astype(int) + 1
        for u, dd in enumerate(durs):
            rows.append((eid, str(t0.date()), u, "view", 1.0, None))
            eid += 1
            # observation horizon: events run to day 60; later
            # conversions are censored at the horizon by the query
            if dd <= 59:
                rows.append((eid, str((t0 + pd.Timedelta(days=int(dd))
                                       ).date()),
                             u, "purchase", 1.0, None))
                eid += 1
        rows.append((eid, str((t0 + pd.Timedelta(days=60)).date()),
                     99999, "view", 1.0, None))
        out = get("q_weibull_fit").fn(
            spark, _write_events(d, rows)).collect()[0]
        assert lo <= out.shape <= hi, (shape, out.shape)

        # direct numpy KM + least squares on the same quantized points
        T = np.where(durs <= 59, durs, 60)
        E = durs <= 59
        xs, ys = [], []
        # the horizon-marker user is censored at day 0, so it leaves
        # the risk set before the first event time — risk starts at N
        n_risk, s = len(T), 1.0
        for t in np.unique(np.sort(T)):
            dcnt = int(((T == t) & E).sum())
            ccnt = int(((T == t) & ~E).sum())
            if dcnt > 0 and dcnt < n_risk:
                s *= np.exp(round(np.log(1 - dcnt / n_risk) * 1e9) / 1e9)
                s_nano = round(s * 1e9)
                if 0 < s_nano < 1e9 and t > 0:
                    xs.append(round(np.log(t) * 1e6) / 1e6)
                    ys.append(round(np.log(-np.log(s_nano / 1e9))
                                    * 1e6) / 1e6)
            n_risk -= dcnt + ccnt
        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(out.shape - slope) < 2e-3, (shape, out.shape, slope)
