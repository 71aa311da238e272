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
