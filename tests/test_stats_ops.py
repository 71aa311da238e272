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
