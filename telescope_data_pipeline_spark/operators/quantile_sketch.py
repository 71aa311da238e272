"""Mergeable epsilon-approximate quantile summaries (GK/MRL-family).

The quantile member of the sketch triad (q_hll_union: distinct counts,
q_cms_count: point frequencies): per-shard compressed rank summaries
whose MERGE is a weighted multiset union — the algebraic shape that
answers "p99 of 100 TB" without a global sort. Where the exact path
(operators/median2pass.py) spends two coordinated passes, the sketch
spends one map pass + a bounded merge, at the price of an eps*n rank
error (GUARANTEED, not probabilistic).

Reference semantics: the reference pipeline computes exact medians of
small in-memory arrays (core.py sigma-clip / median combine); this
operator is the 100 TB generalization the reference never needed.

Construction (three stages, each with bounded state):

1. ``groupBy(v).count()`` — duplicates collapse to one exact
   ``(v, weight)`` entry with map-side combine, so a heavily repeated
   value costs ONE entry however many rows carry it (the round-6
   skew review: sharding raw rows by ``xxhash64(v)`` concentrated all
   duplicates of one value into one shard and made that shard's
   buffered sort O(shard rows)).
2. ``repartition(n_shards, xxhash64(v)).sortWithinPartitions(v)`` —
   content-deterministic sharding over DISTINCT values (uniform even
   when the row distribution is skewed), then a JVM-side external
   sort that SPILLS to disk; Python never sees unsorted data.
3. A streaming compressor over the sorted entry stream with O(1/eps)
   state: keep a running list of (value, gap-weight) points whose
   cumulative weights are EXACT ranks (gaps merge losslessly — merging
   adjacent kept points only coarsens which ranks are addressable,
   never corrupts a cumulative count). Whenever the list exceeds
   ~8/eps entries (4/keep_frac with keep_frac = eps/2) it is
   re-merged greedily so every non-point-mass gap
   stays <= ceil(W_seen * eps/2); since W_seen only grows, final gaps
   are <= ceil(W * eps/2) and the answered quantile's true rank is
   within (eps/2)*n_shard (+1 for the ceil) per shard, eps*n overall.

Determinism: the kept-point set depends only on the sorted distinct
(value, weight) sequence of each shard — not on upstream partitioning,
Arrow batch boundaries, or task order — so the result is identical
across runs, partitionings, and cluster sizes (the
q_random_projection content-addressing argument);
tests/test_stats_sketches.py pins this.

Scale: per-shard Python state is <= ~8/eps + 32 entries (the cap is
ceil(4/keep_frac) + 32 with keep_frac = eps/2) regardless of
shard size (the buffering is in Spark's spill-capable external sort,
not in the Python worker); the driver merge touches
n_shards * O(1/eps) rows — for eps=0.01 and 1024 shards that is ~850k
tiny rows, a bounded collect by construction (the
operators/median2pass.py contract).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: summary schema: kept value + how many source rows it stands for
_SUMMARY_SCHEMA = "v double, w long"


def _remerge(points: list[list[float]], step: int) -> list[list[float]]:
    """Greedily merge adjacent (value, gap) points so merged gaps stay
    <= step. A single point whose own gap exceeds step stays alone —
    it is either point mass at its value (benign: no rank ambiguity
    below it beyond what it already carried) or a prior merged gap
    <= an earlier, smaller step. Cumulative weights are preserved
    exactly; only rank addressability coarsens."""
    out: list[list[float]] = []
    for v, g in points:
        if out and out[-1][1] + g <= step:
            out[-1][0] = v
            out[-1][1] += g
        else:
            out.append([v, g])
    return out


def partition_summaries(df: DataFrame, col: str, eps: float = 0.01,
                        n_shards: int = 16) -> DataFrame:
    """Per-shard compressed rank summaries of ``col``.

    Values are duplicate-collapsed (groupBy + count), repartitioned by
    a content hash of the value with a pinned shard count, and sorted
    within each shard JVM-side (spill-safe); the Python compressor
    then streams the sorted entries with <= ~8/eps + 32 entries
    (ceil(4/keep_frac) + 32, keep_frac = eps/2) of
    state. Weights sum exactly to the non-null row count.
    """
    if not 0 < eps < 1:
        raise ValueError(f"eps must be in (0,1), got {eps}")
    entries = (df.select(F.col(col).cast("double").alias("v"))
               .filter(F.col("v").isNotNull())
               .groupBy("v").agg(F.count(F.lit(1)).alias("w"))
               # content-deterministic sharding over distinct values:
               # same data -> same shards, whatever the upstream
               # partitioning was; duplicates are already one entry so
               # a skewed ROW distribution cannot skew the shards
               .repartition(n_shards, F.xxhash64(F.col("v")))
               .sortWithinPartitions("v"))
    keep_frac = eps / 2.0
    # re-merge trigger: comfortably above the post-merge size
    # (~2/keep_frac) so re-merges amortize to O(1) per entry
    cap = int(math.ceil(4.0 / keep_frac)) + 32

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        points: list[list[float]] = []  # [value, gap-weight], cum = exact
        w_seen = 0
        for b in batches:
            if not len(b):
                continue
            vs = b["v"].to_numpy()
            ws = b["w"].to_numpy()
            for v, w in zip(vs, ws):
                points.append([float(v), int(w)])
                w_seen += int(w)
                if len(points) > cap:
                    step = max(1, int(math.ceil(w_seen * keep_frac)))
                    points = _remerge(points, step)
        if not points:
            return
        step = max(1, int(math.ceil(w_seen * keep_frac)))
        points = _remerge(points, step)
        yield pd.DataFrame({"v": [p[0] for p in points],
                            "w": [int(p[1]) for p in points]})

    return entries.mapInPandas(compress, _SUMMARY_SCHEMA)


def merge_quantiles(summary: DataFrame, probs: list[float]) -> list[float]:
    """Merge shard summaries (bounded collect) and answer quantiles.

    The merge is a sort by value + cumulative weight walk; the value
    returned for probability p has true rank within eps*n of p*n.
    Empty input (zero non-null rows) returns ``[]`` — the caller maps
    that to a schema-correct empty result (the repo-wide boundary
    contract: registered queries never crash on zero-row tables).
    """
    rows = summary.collect()  # bounded: n_shards * O(1/eps) entries
    if not rows:
        return []
    entries = sorted((r["v"], r["w"]) for r in rows)
    total = sum(w for _, w in entries)
    out = []
    for p in probs:
        target = p * total
        cum = 0
        ans = entries[-1][0]
        for v, w in entries:
            cum += w
            if cum >= target:
                ans = v
                break
        out.append(ans)
    return out


def approx_quantiles(df: DataFrame, col: str, probs: list[float],
                     eps: float = 0.01, n_shards: int = 16) -> list[float]:
    """One-shot epsilon-approximate quantiles of ``df[col]``.

    Returns one value per probability, or ``[]`` when the column has
    no non-null values (no quantile exists on an empty multiset).
    """
    return merge_quantiles(partition_summaries(df, col, eps, n_shards),
                           probs)
