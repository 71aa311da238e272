"""Exact distributed heavy hitters: Misra-Gries candidates + rescue.

"Which keys exceed phi = 1/k of the stream?" is trivial when the
key-count table fits a shuffle (groupBy + HAVING) — but at 100 TB of
tokens the full frequency table is itself enormous, and the point of a
heavy-hitter operator is to never materialize it. The classical scale
answer (Misra-Gries 1982; mergeable-summaries form Agarwal et al.
2012):

1. **per-partition Misra-Gries summaries** hold at most ``k`` counters
   each, maintained in one pass (mapInPandas, bounded memory however
   many distinct keys stream through). Guarantee: a key with partition
   frequency f_p is kept with counter >= f_p - n_p/(k+1).
2. **candidate union**: every globally heavy key (f > n/k) must be
   locally over-threshold in at least one partition (else
   f <= sum n_p/(k+1) = n/(k+1) < n/k), so the union of summary keys —
   at most partitions*k rows — is a SUPERSET of the true answer.
3. **exact rescue**: one more scan counts ONLY the candidates
   (broadcast semi-join, map-side-combined groupBy over <= P*k keys),
   and an integer-arithmetic threshold keeps the truly heavy ones.

The result is EXACT (the sketch only prunes the candidate space, the
way the Bloom two-tier dedup rescues its maybe-set), deterministic
regardless of partitioning, and oracle-checkable against a direct
GROUP BY / HAVING.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters_exact", "heavy_hitters_exact_grouped"]


def heavy_hitters_exact(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Keys of ``df[key_col]`` with frequency strictly greater than
    n/k, with exact counts: (``key_col``, ``c``). NULL keys are ignored
    (SQL COUNT semantics). ``k`` bounds summary memory (k counters per
    partition) and sets the threshold phi = 1/k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = df.select(F.col(key_col).cast("string").alias("k")) \
             .filter(F.col("k").isNotNull())

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One Misra-Gries summary per PARTITION (the iterator spans all
        # of the partition's Arrow batches). Batched merge form: add the
        # batch's value counts, then while over k entries subtract the
        # (k+1)-th largest counter and drop the non-positive — the
        # mergeable-summaries reduction with the same error bound.
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, c in pdf["k"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {key: c - cut for key, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({"k": list(counters.keys())})

    cand = keys.mapInPandas(mg, schema="k string").distinct()
    # r13 rescue (guide §2.3/§1.2 — one fewer pass over the stream):
    # instead of a third scan for the total n, the rescue pass counts
    # EVERY row, collapsing non-candidates into one NULL bucket (the
    # left join against the broadcast candidate set tags map-side, so
    # partial aggregation sees <= |cand| + 1 groups). n is then the sum
    # of all bucket counts — exact — via a window over the BOUNDED
    # count table (never the stream). Two passes total: sketch, rescue.
    from pyspark.sql import Window as W

    tagged = keys.join(F.broadcast(cand.withColumn("_hit", F.lit(1))),
                       "k", "left")
    counts = (tagged
              .groupBy(F.when(F.col("_hit") == 1, F.col("k")).alias("kk"))
              .agg(F.count(F.lit(1)).alias("c")))
    wall = (W.partitionBy()  # bounded: <= |candidates| + 1 rows
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (counts.withColumn("n", F.sum("c").over(wall))
            # integer arithmetic: c > n/k as c*k > n, no float division
            .filter(F.col("kk").isNotNull() & (F.col("c") * k > F.col("n")))
            .select(F.col("kk").alias(key_col), "c"))


def heavy_hitters_exact_grouped(df: DataFrame, group_col: str,
                                key_col: str, k: int) -> DataFrame:
    """Per-group phi-frequent keys with exact counts:
    (``group_col``, ``key_col``, ``c``) where c * k > n_group.

    Same sketch-prunes/rescue-exacts shape as
    :func:`heavy_hitters_exact`, with one Misra-Gries summary per
    (partition, group): the superset guarantee holds group-by-group
    because the per-partition counts of ONE group are themselves an MG
    stream. State is k counters per group per partition — bounded by
    the number of groups co-resident in a partition times k, so for
    high-cardinality group columns repartition the input by
    ``group_col`` first (each group then pays its k counters once, and
    the candidate union stays <= |groups| * k rows). Rescue counts
    only candidate (group, key) pairs; per-group totals ride a
    broadcast. Exact and partitioning-independent, so the direct GROUP
    BY / HAVING oracle must match bit-for-bit."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = (df.select(F.col(group_col).cast("string").alias("g"),
                      F.col(key_col).cast("string").alias("k"))
            .filter(F.col("k").isNotNull() & F.col("g").isNotNull()))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        per_group: dict[str, dict[str, int]] = {}
        for pdf in batches:
            for (g, key), c in pdf.value_counts(["g", "k"]).items():
                counters = per_group.setdefault(g, {})
                counters[key] = counters.get(key, 0) + int(c)
                if len(counters) > k:
                    cut = sorted(counters.values(), reverse=True)[k]
                    per_group[g] = {ky: c2 - cut
                                    for ky, c2 in counters.items()
                                    if c2 - cut > 0}
        yield pd.DataFrame(
            [{"g": g, "k": ky} for g, cs in per_group.items() for ky in cs],
            columns=["g", "k"])

    cand = keys.mapInPandas(mg, schema="g string, k string").distinct()
    # r13 rescue: same two-pass fold as heavy_hitters_exact — the
    # rescue pass counts every row with non-candidates collapsed into
    # one NULL bucket PER GROUP, and each group's exact total n is a
    # window sum over its bounded (<= |cand_g| + 1 rows) count slice —
    # the third full scan the separate per-group totals aggregate paid
    # is gone (measured: three tokenize+explode map stages -> two).
    from pyspark.sql import Window as W

    tagged = keys.join(F.broadcast(cand.withColumn("_hit", F.lit(1))),
                       ["g", "k"], "left")
    counts = (tagged
              .groupBy("g",
                       F.when(F.col("_hit") == 1, F.col("k")).alias("kk"))
              .agg(F.count(F.lit(1)).alias("c")))
    wg = (W.partitionBy("g")
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (counts.withColumn("n", F.sum("c").over(wg))
            .withColumnRenamed("kk", "k")
            .filter(F.col("k").isNotNull() & (F.col("c") * k > F.col("n")))
            .select(F.col("g").alias(group_col),
                    F.col("k").alias(key_col), "c"))
