"""Edge semantics of the interval overlap join operator
(operators/interval_join.py): boundary touches, containment, bucket
spans, canonical-bucket dedup, and invalid-interval handling."""

from __future__ import annotations

from telescope_data_pipeline_spark.operators.interval_join import (
    interval_overlap_join,
)


def _pairs(spark, left, right, width):
    l = spark.createDataFrame(left, "lid long, ls long, le long")
    r = spark.createDataFrame(right, "rid long, rs long, re long")
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re",
                                bucket_width=width)
    return {(row.lid, row.rid) for row in out.collect()}


def test_interval_join_boundary_touch_and_containment(spark):
    got = _pairs(
        spark,
        [(1, 0, 100),      # touches r1 at exactly 100 (closed: overlap)
         (2, 500, 600),    # strictly inside r2
         (3, 900, 950)],   # no overlap with anything
        [(10, 100, 200),
         (20, 400, 700),
         (30, 0, 50)],
        width=64)
    assert got == {(1, 10), (1, 30), (2, 20)}


def test_interval_join_long_span_emitted_once(spark):
    """An interval spanning many buckets shares several buckets with its
    match — the canonical-bucket rule must emit the pair exactly once
    (counted via collect, not a set)."""
    l = spark.createDataFrame([(1, 0, 1000)], "lid long, ls long, le long")
    r = spark.createDataFrame([(10, 0, 1000)], "rid long, rs long, re long")
    rows = interval_overlap_join(l, r, "ls", "le", "rs", "re",
                                 bucket_width=10).collect()
    assert len(rows) == 1  # 101 shared buckets, one output row


def test_interval_join_drops_null_and_inverted(spark):
    got = _pairs(
        spark,
        [(1, 100, 50),     # inverted: matches nothing
         (2, None, 100),   # NULL bound: dropped
         (3, 0, 10)],
        [(10, 0, 1000)],
        width=16)
    assert got == {(3, 10)}


def test_interval_join_negative_axis(spark):
    """floor-based bucketing must stay consistent for negative values
    (floor division, not truncation)."""
    got = _pairs(spark, [(1, -150, -50)], [(10, -60, -10), (20, -300, -200)],
                 width=64)
    assert got == {(1, 10)}


def test_order_count_dist_keeps_zero_bucket(spark, tmp_path):
    """Q13 shape: customers with NO (qualifying) orders must appear in
    the c_count = 0 bucket — the filter lives in the JOIN condition,
    not WHERE. Planted: 3 customers; one with two normal orders, one
    with only an excluded-priority order (counts as zero), one with
    no orders at all."""
    import pandas as pd

    from telescope_data_pipeline_spark.queries import get

    pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_nationkey": [0, 0, 0],
        "c_acctbal": [10.0, 20.0, 30.0],
    }).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({
        "o_orderkey": [100, 101, 102],
        "o_custkey": [1, 1, 2],
        "o_orderpriority": ["2-HIGH", "3-MEDIUM", "1-URGENT"],
    }).to_parquet(tmp_path / "orders.parquet")
    rows = {r.c_count: r.custdist for r in
            get("q_order_count_dist").fn(spark, str(tmp_path)).collect()}
    assert rows == {0: 2, 2: 1}


def test_priority_pipeline_counts_order_once(spark, tmp_path):
    """Q4 shape: an order with MANY late lineitems counts once (the
    EXISTS/semi-join contract); an order whose lines all shipped
    within 30 days does not count; an order outside the quarter is
    filtered."""
    import datetime as dt

    import pandas as pd

    from telescope_data_pipeline_spark.queries import get

    pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [1, 1, 1],
        "o_orderdate": [dt.datetime(1996, 7, 10),
                        dt.datetime(1996, 8, 10),
                        dt.datetime(1997, 1, 10)],
        "o_orderpriority": ["2-HIGH", "2-HIGH", "2-HIGH"],
    }).to_parquet(tmp_path / "orders.parquet", coerce_timestamps="us")
    pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 3],
        "l_shipdate": [dt.datetime(1996, 9, 1),   # late (53 days)
                       dt.datetime(1996, 10, 1),  # late again (same order)
                       dt.datetime(1996, 7, 12),  # on time
                       dt.datetime(1996, 8, 20),  # on time (10 days)
                       dt.datetime(1997, 6, 1)],  # late but out of window
    }).to_parquet(tmp_path / "lineitem.parquet", coerce_timestamps="us")
    rows = {r.o_orderpriority: r.order_count for r in
            get("q_priority_pipeline").fn(spark, str(tmp_path)).collect()}
    assert rows == {"2-HIGH": 1}
