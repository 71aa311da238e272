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
