"""Mergeable epsilon-approximate quantile summaries (GK/MRL-family).

The quantile member of the sketch triad (q_hll_union: distinct counts,
q_cms_count: point frequencies): per-partition compressed rank
summaries whose MERGE is a weighted multiset union — the algebraic
shape that answers "p99 of 100 TB" without a global sort. Where the
exact path (operators/median2pass.py) spends two coordinated passes,
the sketch spends one map pass + a bounded merge, at the price of an
eps*n rank error (GUARANTEED, not probabilistic).

Reference semantics: the reference pipeline computes exact medians of
small in-memory arrays (core.py sigma-clip / median combine); this
operator is the 100 TB generalization the reference never needed.

Algorithm (simplified Manku-Rajagopalan-Lindsay): each partition sorts
its values and keeps every ceil(n_p * eps_half)-th one, recording the
GAP (number of source rows the kept point stands for, itself included).
Kept points carry exact local rank information, so after merging all
partition summaries by value, the cumulative-weight position of any
kept point differs from its true global rank by at most the sum of
intra-gap slacks < (eps/2) * n per side — querying the cumulative
weights therefore lands within eps*n ranks of the true quantile.

Determinism: the summary depends only on each partition's value
multiset; `approx_quantiles` first repartitions by a content hash with
a pinned shard count, so the result is identical across runs,
partitionings, and cluster sizes (the q_random_projection
content-addressing argument).

Scale: the map pass is Arrow-batched per partition with bounded state
(<= 2/eps + 2 entries per partition regardless of partition size); the
driver merge touches n_shards * (2/eps + 2) rows — for eps=0.01 and
1024 shards that is ~210k tiny rows, a bounded collect by
construction (the operators/median2pass.py contract).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: summary schema: kept value + how many source rows it stands for
_SUMMARY_SCHEMA = "v double, w long"


def partition_summaries(df: DataFrame, col: str, eps: float = 0.01,
                        n_shards: int = 16) -> DataFrame:
    """Per-shard compressed rank summaries of ``col``.

    Rows are first repartitioned by a content hash of the value with a
    pinned shard count so the sketch is partitioning-independent; each
    shard then compresses to <= 2/eps + 2 (value, weight) entries.
    """
    if not 0 < eps < 1:
        raise ValueError(f"eps must be in (0,1), got {eps}")
    vals = (df.select(F.col(col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            # content-deterministic sharding: same data -> same shards,
            # whatever the upstream partitioning was
            .repartition(n_shards, F.xxhash64(F.col("v"))))
    keep_frac = eps / 2.0

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b["v"].to_numpy() for b in batches if len(b)]
        if not parts:
            return
        import numpy as np

        v = np.sort(np.concatenate(parts))
        n = len(v)
        # ceil keeps the entry count <= 2/eps + 1 (floor could exceed
        # it by a whole extra gap) and each gap <= n*eps/2 + 1
        step = max(1, int(math.ceil(n * keep_frac)))
        # keep ranks step-1, 2*step-1, ... and always the last (max);
        # each kept point's weight is the count of rows since the
        # previous kept point — weights sum exactly to n
        idx = list(range(step - 1, n, step))
        if idx[-1] != n - 1:
            idx.append(n - 1)
        prev = -1
        out_v, out_w = [], []
        for i in idx:
            out_v.append(v[i])
            out_w.append(i - prev)
            prev = i
        yield pd.DataFrame({"v": out_v, "w": out_w})

    return vals.mapInPandas(compress, _SUMMARY_SCHEMA)


def merge_quantiles(summary: DataFrame, probs: list[float]) -> list[float]:
    """Merge shard summaries (bounded collect) and answer quantiles.

    The merge is a sort by value + cumulative weight walk; the value
    returned for probability p has true rank within eps*n of p*n.
    """
    rows = summary.collect()  # bounded: n_shards * (2/eps + 2) entries
    if not rows:
        raise ValueError("empty input: no quantiles")
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
    """One-shot epsilon-approximate quantiles of ``df[col]``."""
    return merge_quantiles(partition_summaries(df, col, eps, n_shards),
                           probs)
