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
    # Cumulative population predicate. Each refine level narrows the
    # population with the PREVIOUS level's exact bucket expression
    # (b.between(b1, b2)), never with a recomputed float range test —
    # (v >= lo + b1*width) can disagree with floor((v-lo)/width) by one
    # ulp at bucket boundaries, which would silently drop or
    # double-count boundary values and desynchronize the carried ranks.
    pred = F.col("v").isNotNull()

    for _ in range(max_depth):
        if lo == hi:
            return lo
        width = (hi - lo) / buckets
        if width == 0.0:  # hi-lo underflowed: a few-ulp range; finish
            vals = sorted(r["v"] for r in base.filter(pred).collect())
            return (vals[k1 - 1] + vals[k2 - 1]) / 2.0
        # clamp both ends: under the cumulative predicate a value can
        # sit one ulp outside [lo, hi) of the CURRENT grid
        b = F.greatest(
            F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(buckets - 1)),
            F.lit(0))
        pop = base.filter(pred)
        # per-bucket (count, min, max): 3B driver-side values. min/max
        # let the straddle case resolve in O(1) and give exact bounds
        # for the recursion range (guaranteed progress).
        hist = {
            r["b"]: r for r in
            pop.groupBy(b.alias("b")).agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()}
        # walk cumulative counts to locate the buckets holding k1, k2
        # (ranks are RELATIVE to the current candidate population)
        cum, b1, b2 = 0, None, None
        below = 0  # count in buckets strictly before b1
        for i in range(buckets):
            c = hist[i]["c"] if i in hist else 0
            if b1 is None and cum + c >= k1:
                b1 = i
                below = cum
            cum += c
            if b2 is None and cum >= k2:
                b2 = i
                break
        assert b1 is not None and b2 is not None
        if b1 != b2:
            # k2 = k1 + 1 and cum(end of b1) == k1 exactly, so rank k1
            # is the LARGEST value in bucket b1 and rank k2 the
            # SMALLEST in the next nonempty bucket b2 — both already
            # in the histogram. No further scan needed.
            return (hist[b1]["mx"] + hist[b2]["mn"]) / 2.0
        cell = hist[b1]
        if cell["mn"] == cell["mx"]:  # one distinct value holds both ranks
            return cell["mn"]
        if cell["c"] <= _REFINE_CAP:
            # select by the SAME bucket expression as the histogram
            vals = sorted(
                r["v"] for r in pop.filter(b == b1).collect())
            return (vals[k1 - below - 1] + vals[k2 - below - 1]) / 2.0
        # pathological concentration: narrow via the SAME bucket
        # expression the histogram counted with, re-rank, and use the
        # bucket's ACTUAL min/max as the next range (strictly tighter
        # than the bucket edges: min lands in sub-bucket 0 and max in
        # sub-bucket B-1, so the next level always splits the mass)
        k1, k2 = k1 - below, k2 - below
        pred = pred & (b == b1)
        lo, hi = float(cell["mn"]), float(cell["mx"])
    raise RuntimeError(
        f"median refine exceeded depth {max_depth} — near-degenerate "
        f"distribution; raise buckets or use percentile() directly")
