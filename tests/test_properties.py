"""Property-based invariants (SURVEY.md §5.3) — hypothesis generates the
inputs, Spark evaluates the expressions, numpy is the ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from telescope_data_pipeline_spark.functions.astro import (
    flux_from_mag,
    julian_date,
    mag,
    phase_fold,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def sql(spark):
    def run(expr_col, rows, schema):
        return [r.out for r in
                spark.createDataFrame(rows, schema).select(expr_col.alias("out")).collect()]

    return run


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=1e-6, max_value=1e12,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
def test_mag_flux_round_trip(sql, fluxes):
    """flux -> mag -> flux is the identity (p_io.py:111 inverse pair)."""
    out = sql(flux_from_mag(mag(F.col("f"))), [(f,) for f in fluxes], "f double")
    assert np.allclose(out, fluxes, rtol=1e-9)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=4e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
def test_julian_date_matches_numpy(sql, secs):
    out = sql(julian_date(F.col("s")), [(s,) for s in secs], "s double")
    want = [s / 86400.0 + 2440587.5 for s in secs]
    assert np.allclose(out, want, rtol=0, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20),
       st.floats(min_value=0.5, max_value=100))
def test_phase_fold_in_unit_interval(sql, ts, period):
    out = sql(phase_fold(F.col("t"), 0.0, period), [(t,) for t in ts], "t double")
    assert all(0.0 <= p < 1.0 or math.isclose(p, 0.0) for p in out)


def test_sigma_clip_matches_numpy_reference(spark):
    """The window-based operator equals a direct numpy implementation of
    the same 3-iteration sigma=2 clip."""
    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.normal(50, 5, 500), rng.uniform(200, 400, 20)])
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, value double")

    from telescope_data_pipeline_spark.operators.sigma_clip import sigma_clip

    kept = np.sort([r.value for r in sigma_clip(df, ["g"], "value").collect()])

    cur = vals.copy()
    for _ in range(3):
        m, s = cur.mean(), cur.std(ddof=1)
        cur = cur[(cur >= m - 2 * s) & (cur <= m + 2 * s)]
    assert np.allclose(kept, np.sort(cur))


def test_nn_join_matches_brute_force(spark):
    """Grid-bucketed NN join == brute-force nearest neighbor, including
    the left-outer null for out-of-range rows (core.py:148-177)."""
    rng = np.random.default_rng(4)
    left = [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 1000, 120))]
    right = [(int(i + 1000), float(v)) for i, v in enumerate(rng.uniform(0, 1000, 60))]
    ldf = spark.createDataFrame(left, "lid long, lv double")
    rdf = spark.createDataFrame(right, "rid long, rv double")

    from telescope_data_pipeline_spark.operators.nn_join import nn_join

    got = {r.lid: (r.rid, r.dist)
           for r in nn_join(ldf, rdf, ["lid"], [("lv", "rv")], 25.0, ["rid"]).collect()}

    for lid, lv in left:
        best = min(((abs(lv - rv), rid) for rid, rv in right), default=None)
        if best is None or best[0] >= 25.0:
            assert got[lid][0] is None, lid
        else:
            assert got[lid][0] == best[1], lid
            assert math.isclose(got[lid][1], best[0], rel_tol=1e-9)


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join == pandas merge_asof(direction='backward') on random
    keyed time series — pandas is the independent ground truth for the
    union+window rewrite (exact ties match; missing keys stay null)."""
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 200
    left = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "t": rng.integers(0, 10_000, n_l).astype("datetime64[s]"),
        "lv": rng.normal(size=n_l).round(3),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, n_r),  # some keys absent on the left
        "t": rng.integers(0, 10_000, n_r).astype("datetime64[s]"),
        "rv": rng.normal(size=n_r).round(3),
    }).drop_duplicates(["k", "t"])  # asof requires unique (key, ts)

    from telescope_data_pipeline_spark.operators.asof import asof_join

    lsp = spark.createDataFrame(left.rename(columns={"t": "ts"}))
    rsp = spark.createDataFrame(right.rename(columns={"t": "ts"}))
    got = (asof_join(lsp, rsp, ["k"], "ts", "ts", ["rv"])
           .toPandas()
           .sort_values(["k", "ts", "lv"]).reset_index(drop=True))

    want = (pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                          on="t", by="k", direction="backward")
            .rename(columns={"t": "ts"})
            .sort_values(["k", "ts", "lv"]).reset_index(drop=True))
    assert len(got) == len(want) == n_l
    pd.testing.assert_series_equal(got["rv"], want["rv"],
                                   check_exact=False, rtol=1e-12)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                min_size=1, max_size=60, unique=True),
       st.integers(min_value=1, max_value=9))
def test_prefix_sum_matches_sequential_fold(spark, keys, n_parts):
    """Any unique integral key set, any shard count: the distributed
    prefix sum equals the sequential cumulative sum in key order."""
    from telescope_data_pipeline_spark.operators.prefix_sum import (
        distributed_prefix_sum,
    )

    rows = [(k, (k % 13) - 6) for k in keys]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.cum for r in
           distributed_prefix_sum(df, "k", "v",
                                  num_partitions=n_parts).collect()}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                min_size=1, max_size=60, unique=True),
       st.integers(min_value=1, max_value=9))
def test_distributed_row_number_matches_sort(spark, keys, n_parts):
    """Any unique key set, any shard count: positions equal the rank in
    a plain sort."""
    from telescope_data_pipeline_spark.operators.rank import (
        distributed_row_number,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.position for r in
           distributed_row_number(df, order_cols=["k"],
                                  num_partitions=n_parts).collect()}
    for pos, k in enumerate(sorted(keys)):
        assert got[k] == pos
