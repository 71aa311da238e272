"""Sigma-clipped statistics — the reference's workhorse robust aggregate.

Reference: ``sigma_clipped_stats(data, sigma=2.0)`` is called at every
stage (core.py:70, core.py:141, core.py:372, core.py:438, psf_phot.py:68):
iteratively drop values more than sigma standard deviations from the mean,
re-estimate, repeat until fixpoint (astropy defaults to 5 iterations; the
distribution converges in ≤3 on the data shapes involved).

Spark-first form: a bounded loop of {per-group window stats → filter}.
The mean/stddev of each group are window aggregates over
``partitionBy(group)``, so the whole unrolled loop needs exactly ONE
shuffle (the first window's hash partitioning is reused by every later
iteration — Catalyst sees the partitioning requirement already met) and
the lineage stays linear, unlike an agg+join formulation whose lineage
tree re-scans the source O(iters²) times. No per-row Python, fully
codegen'd, and the unrolled form is expressible in ANSI SQL so the
operator stays oracle-checkable (SURVEY.md §7 'what's hard' #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sigma_clip(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sigma: float = 2.0,
    iters: int = 3,
) -> DataFrame:
    """Return the input rows that survive ``iters`` rounds of clipping."""
    cur = df.select(*group_cols, value_col)
    w = W.partitionBy(*group_cols)
    for _ in range(iters):
        m = F.avg(value_col).over(w)
        s = F.stddev_samp(value_col).over(w)
        cur = (
            cur.withColumn("__m", m).withColumn("__s", s)
            .filter(
                (F.col(value_col) >= F.col("__m") - sigma * F.col("__s"))
                & (F.col(value_col) <= F.col("__m") + sigma * F.col("__s"))
            )
            .drop("__m", "__s")
        )
    return cur


def sigma_clipped_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sigma: float = 2.0,
    iters: int = 3,
) -> DataFrame:
    """Per-group (count, clipped mean, clipped stddev) after clipping —
    the triple the reference's sigma_clipped_stats returns."""
    kept = sigma_clip(df, group_cols, value_col, sigma=sigma, iters=iters)
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.avg(value_col), 6).alias("clipped_mean"),
        F.round(F.stddev_samp(value_col), 6).alias("clipped_std"),
    )


def unrolled_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    sigma: float = 2.0,
    iters: int = 3,
) -> str:
    """The identical computation as ANSI SQL (DuckDB oracle), iterations
    unrolled as chained CTEs."""
    g = ", ".join(group_cols)
    parts = [f"f0 AS (SELECT {g}, {value_col} FROM {table})"]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS (SELECT {g}, AVG({value_col}) AS m, "
            f"STDDEV_SAMP({value_col}) AS s FROM f{i-1} GROUP BY {g})"
        )
        parts.append(
            f"f{i} AS (SELECT f{i-1}.* FROM f{i-1} JOIN s{i} USING ({g}) "
            f"WHERE {value_col} >= m - {sigma} * s "
            f"AND {value_col} <= m + {sigma} * s)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT {g}, COUNT(*) AS n_kept, "
        f"ROUND(AVG({value_col}), 6) AS clipped_mean, "
        f"ROUND(STDDEV_SAMP({value_col}), 6) AS clipped_std "
        f"FROM f{iters} GROUP BY {g}"
    )
