"""Skew-mitigation patterns: salting for hot keys, bucketing for
co-located joins (SURVEY.md 'Partitioning & shuffle').

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py); these operators are for the cases AQE cannot
fix: a single group key so hot that even one split of it overwhelms a
task (salted aggregation), and repeated large-large joins on the same
key where the shuffle itself is the cost (bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage sum/count aggregation for skewed group keys.

    Stage 1 groups by (keys, salt) — the hot key's rows spread over
    ``n_salts`` tasks; stage 2 reduces the ``n_salts`` partials per key.
    The salt is derived from stable row content (hash of the value
    columns), keeping the plan deterministic. Works for any algebraic
    aggregate; sums and counts are provided, avg = sum/count at the end.

    Returns one row per key: ``sum_<col>`` for each of ``sums`` and
    ``n_rows``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in sums]), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*keys, salt, *sums)
        .groupBy(*keys, "__salt")
        .agg(*[F.sum(c).alias(f"__s_{c}") for c in sums],
             F.count(F.lit(1)).alias("__n"))
    )
    return (
        partial.groupBy(*keys)
        .agg(*[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums],
             F.sum("__n").alias("n_rows"))
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Large-skewed ⋈ medium join without one giant task: the skewed side
    gets a content-derived salt in [0, n_salts); the other side is
    replicated n_salts times; the join key becomes (key, salt), so the
    hot key's rows land on n_salts different reducers.

    Use when the medium side is too big to broadcast but small enough to
    replicate n_salts×. (If it fits a broadcast, just broadcast.)
    """
    other_cols = [c for c in skewed.columns if c != key]
    l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other_cols]), F.lit(n_salts)))
    r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, on=[key, "__salt"]).drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    """Persist as a bucketed+sorted table: later equi-joins/aggs on
    ``key`` between tables bucketed the same way need NO shuffle — the
    scan's output partitioning already satisfies the join requirement
    (asserted in tests/test_scale_patterns.py)."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
