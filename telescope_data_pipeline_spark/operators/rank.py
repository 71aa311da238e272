"""Distributed global row numbering (rank over a total order).

``row_number() OVER (ORDER BY ...)`` with no partitioning is the same
scale trap as the global cumulative sum: one task receives every row.
The two-phase form here mirrors ``prefix_sum``:

1. bucket rows by an integral projection of the sort key
   (``range_bucket`` — deterministic, order-consistent: bucket i's keys
   all precede bucket i+1's);
2. count rows per bucket (≤ n integers), prefix-sum the counts on the
   driver into per-bucket bases;
3. global position = bucket base + (local row_number within the
   bucket) — a bucket-partitioned window, parallel everywhere.

The integral bucket key only needs to be MONOTONE in the true sort
order (ties within the projection stay in one bucket and are resolved
by the full sort columns locally), which is what lets a string sort key
(e.g. an md5 hex digest) bucket through its numeric prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .cache_slot import CacheSlot
from .range_bucket import bucketed_prefix_bases

__all__ = ["distributed_row_number"]

_SLOT = CacheSlot()


def distributed_row_number(df: DataFrame, order_cols: list[str],
                           bucket_key: Column | str | None = None,
                           out_col: str = "position",
                           num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = 0-based global position of each row under the
    total order of ``order_cols`` (which must be unique and non-null as
    a tuple), without a single-partition sort.

    ``bucket_key``: integral column monotone in the order (defaults to
    the first order column, which then must be an integral/date/
    timestamp type). For string sort keys pass a numeric prefix
    projection, e.g. ``F.conv(F.substring(h, 1, 15), 16, 10)`` for an
    md5 hex digest — equal-length hex compares as its numeric value.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = "_rk" if bucket_key is not None else order_cols[0]
    work = df if bucket_key is None else \
        df.withColumn("_rk", F.col(bucket_key).cast("long")
                      if isinstance(bucket_key, str) else
                      bucket_key.cast("long"))
    # Shared two-phase scaffold (range_bucket.bucketed_prefix_bases):
    # bucket + cache + per-bucket row count + driver prefix fold.
    bucketed, base = bucketed_prefix_bases(
        work, key, n, measure=F.count(F.lit(1)), slot=_SLOT, zero=0)
    if bucketed is None:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long"))
    local = W.partitionBy("_pid").orderBy(*order_cols)
    return (bucketed.join(F.broadcast(base), "_pid")
            .withColumn(out_col,
                        F.col("_base") + F.row_number().over(local) - 1)
            .drop("_pid", "_base", *(["_rk"] if bucket_key is not None else [])))
