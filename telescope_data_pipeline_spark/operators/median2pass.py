"""Exact median at scale WITHOUT a global sort: histogram + refine.

`percentile(col, 0.5)` is exact but sort-based per group;
`percentile_approx` is cheap but approximate. This operator is the
third point on that trade-off: the exact answer in two linear scans —
the way you compute an exact quantile over 100 TB when neither a
global sort nor an approximation is acceptable (billing cutoffs,
regulatory thresholds).

Pass 1: one map-side-combined groupBy over ``B`` equal-width buckets
of [min, max] — B counts reach the driver (bounded state). The driver
walks the cumulative counts to find which bucket(s) hold the two
middle order statistics. Pass 2: scan again, keep ONLY rows in those
buckets (a pushed-down range filter), and take the order statistics
from that small set. If a bucket is still too big (pathological skew:
most mass on few distinct values), recurse into it — each level
divides the candidate range by B, so depth is log_B(spread/precision);
the fallback is capped and loud, never silent.

The final interpolation avg(v_a, v_b) is one IEEE op on exact stored
doubles — deterministic, matching sort-based engines bit-for-bit
(golden + oracle-tested via queries/retrieval.py::q_median_twopass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_median_two_pass"]

#: candidate-set cap for the refine pass; beyond this we recurse.
_REFINE_CAP = 100_000


def exact_median_two_pass(df: DataFrame, col: str, buckets: int = 1024,
                          max_depth: int = 8) -> float:
    """Exact interpolated median of ``df[col]`` in two (rarely more)
    linear scans. Returns the same value as ``percentile(col, 0.5)``.
    """
    stats = df.agg(F.count(col).alias("n"), F.min(col).alias("lo"),
                   F.max(col).alias("hi")).first()
    n = stats["n"]
    if n == 0:  # before float(): min/max are NULL on empty input
        raise ValueError("median of empty input")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    # ranks of the two middle order statistics (1-based)
    k1 = (n + 1) // 2
    k2 = n // 2 + 1
    base = df.select(F.col(col).alias("v"))

    for _ in range(max_depth):
        if lo == hi:
            return lo
        width = (hi - lo) / buckets
        b = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(buckets - 1))
        hist = dict(
            base.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("c"))
            .collect())
        # walk cumulative counts to locate the buckets holding k1, k2
        # (ranks are RELATIVE to the current [lo, hi] candidate range)
        cum, b1, b2 = 0, None, None
        for i in range(buckets):
            cum += hist.get(i, 0)
            if b1 is None and cum >= k1:
                b1 = i
            if b2 is None and cum >= k2:
                b2 = i
                break
        assert b1 is not None and b2 is not None
        in_bucket = sum(hist.get(i, 0) for i in range(b1, b2 + 1))
        if in_bucket <= _REFINE_CAP:
            below = sum(hist.get(i, 0) for i in range(b1))
            # select by the SAME bucket expression as pass 1 — a float
            # range test (v >= lo + b1*width) can disagree with
            # floor((v-lo)/width) by one ulp at bucket boundaries
            vals = sorted(
                r["v"] for r in base.filter(
                    (F.col("v") >= lo) & (F.col("v") <= hi)
                    & b.between(b1, b2)
                ).collect())
            v1 = vals[k1 - below - 1]
            v2 = vals[k2 - below - 1]
            return (v1 + v2) / 2.0
        # pathological concentration: narrow the range and re-rank
        k_below = sum(hist.get(i, 0) for i in range(b1))
        k1, k2 = k1 - k_below, k2 - k_below
        lo, hi = lo + b1 * width, lo + (b2 + 1) * width
    raise RuntimeError(
        f"median refine exceeded depth {max_depth} — near-degenerate "
        f"distribution; raise buckets or use percentile() directly")
