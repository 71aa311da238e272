"""Interval overlap join: the 1-D temporal analog of the grid NN join.

Spark has no native interval join; the declarative theta form
``a.start <= b.end AND b.start <= a.end`` plans as a nested-loop — the
O(n·m) shape that dies at scale (same failure mode as the reference's
coordinate-match loops, core.py:148-177, which operators/nn_join.py
rewrites for 2-D points). This operator is the interval rewrite:

1. chunk the time axis into fixed-width buckets;
2. explode each interval into the buckets it covers (bounded by
   interval_length / bucket_width — pick the width near the typical
   interval length so the expansion factor stays ~2);
3. equi-join on the bucket id — a hash-partitioned shuffle join whose
   cost is linear in the exploded sizes, never |L|·|R|;
4. emit each candidate pair in exactly ONE canonical bucket — the
   bucket of ``max(l_start, r_start)``, which any overlapping pair
   covers on both sides — so no ``distinct`` is needed (dedup by
   construction, not by a second shuffle);
5. refine with the exact overlap predicate.

Intervals are CLOSED ([start, end], overlap iff ls <= re AND rs <= le)
over any integral axis (epoch micros, seconds, positions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str, l_end: str,
    r_start: str, r_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (left row, right row) pairs whose closed intervals overlap.

    ``left``/``right``: any columns plus integral ``*_start``/``*_end``
    (start <= end; rows violating that or carrying NULL bounds are
    dropped — an inverted interval matches nothing). Column names must
    be disjoint between the two sides. Returns left columns + right
    columns for every overlapping pair, exactly once per pair.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(int(bucket_width))

    def buckets(df, s, e):
        ok = df.filter(F.col(s).isNotNull() & F.col(e).isNotNull()
                       & (F.col(s) <= F.col(e)))
        return ok.withColumn(
            "_ivb", F.explode(F.sequence(F.floor(F.col(s) / w),
                                         F.floor(F.col(e) / w))))

    lb = buckets(left, l_start, l_end)
    rb = buckets(right, r_start, r_end)
    canon = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w)
    return (
        lb.join(rb, "_ivb")
        # one canonical bucket per pair: both sides cover the bucket of
        # max(starts) whenever the intervals overlap, so this filter
        # keeps exactly one copy of every true pair (and the exact
        # predicate below removes the false candidates)
        .filter((F.col("_ivb") == canon)
                & (F.col(l_start) <= F.col(r_end))
                & (F.col(r_start) <= F.col(l_end)))
        .drop("_ivb")
    )
