"""As-of (point-in-time) join — the time-series join Spark's DataFrame
API lacks as a primitive.

Semantics: for every left row, attach the single most recent right row
with ``right_ts <= left_ts`` (backward direction) sharing the join keys
— the standard point-in-time lookup (pandas ``merge_asof``, DuckDB/kdb
``ASOF JOIN``).

Scale-first rewrite: the naive form is a range join (|L|·|R| worst
case). Instead, UNION the two sides tagged by origin, sort within each
key partition by (ts, origin), and carry the right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window —
ONE shuffle on the join keys, linear in |L|+|R|, no pair explosion, and
AQE-skew-splittable like any window. The same trick underlies
stream-table temporal joins in Flink's versioned-table join; here it is
pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: float | None = None,
) -> DataFrame:
    """LEFT as-of join: left columns + ``right_cols`` from the most
    recent right row at or before the left timestamp (per ``keys``).

    Right rows must be unique per (keys, right_ts) — pre-aggregate if
    not, or the carried row is nondeterministic. ``tolerance_s`` nulls
    the match when the right row is older than the window (pandas
    ``merge_asof(tolerance=...)``).

    Returns all left columns plus ``right_cols`` and ``asof_ts`` (the
    matched right timestamp, null when no match).
    """
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys],
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *right_cols,
        F.col(right_ts).alias("__rts"),
    ).select(*l.columns)  # align column order for unionByName-by-position
    combined = l.unionByName(r)

    # right rows (src=0) sort before left rows at equal ts, so an exact
    # timestamp tie matches (ASOF's `left_ts >= right_ts`)
    w = (W.partitionBy(*keys).orderBy("__ts", "__src")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = combined.select(
        *left_cols, "__src", "__ts",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = filled.filter(F.col("__src") == 1)
    if tolerance_s is not None:
        stale = (F.col("__ts").cast("double")
                 - F.col("asof_ts").cast("double")) > tolerance_s
        out = out.select(
            *left_cols, "__src", "__ts",
            *[F.when(stale, None).otherwise(F.col(c)).alias(c)
              for c in right_cols],
            F.when(stale, None).otherwise(F.col("asof_ts")).alias("asof_ts"),
        )
    return out.drop("__src", "__ts")
