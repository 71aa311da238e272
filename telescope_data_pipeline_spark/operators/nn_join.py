"""Nearest-neighbor joins — the reference's spatial matching, Spark-first.

Reference semantics (core.py:148-177 ``calculate_shift``): for every star
in image A find the single closest star in image B; keep the match only if
distance < cutoff, else emit a null row (LEFT OUTER, core.py:166). The
reference does an O(n·m) per-row distance loop; at scale that cross join is
the bottleneck, so the engine rewrites it as:

  bucket both sides on floor(coord / cutoff) → explode the right side into
  its 3^d neighbor cells → EQUI-join on cell id (hash-partitioned shuffle,
  no cross product) → refine with the exact distance predicate → window
  top-1 per left row → left join back for outer semantics.

Any true nearest neighbor within ``max_dist`` is guaranteed to sit in the
left row's cell or an adjacent cell, so the bucketed join loses nothing.
Cost: |right|·3^d duplicated rows instead of |left|·|right| pairs — at
1000 executors the equi-join shuffles by cell key and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _neighbor_offsets(dims: int) -> list[tuple[int, ...]]:
    offs: list[tuple[int, ...]] = [()]
    for _ in range(dims):
        offs = [o + (d,) for o in offs for d in (-1, 0, 1)]
    return offs


def nn_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    coords: list[tuple[str, str]],
    max_dist: float,
    right_cols: list[str],
    dist_col: str = "dist",
    tiebreak: str | None = None,
    k: int = 1,
) -> DataFrame:
    """Left-outer k-nearest-neighbor join in d dimensions (k=1: the
    reference's single-best match).

    Parameters
    ----------
    left_keys : columns that uniquely identify a left row.
    coords    : [(left_coord_col, right_coord_col), ...] — one pair per
                dimension; distance is Euclidean over these.
    max_dist  : match cutoff (reference: 20 px, core.py:172). Also the
                grid cell width.
    right_cols: right-side columns to carry into the result (null when
                unmatched).
    tiebreak  : right-side column that makes the top-k pick deterministic
                under exact distance ties (defaults to right_cols[0]).
    k         : neighbors kept per left row (window rank <= k). With
                k > 1 the output carries a ``rank`` column; unmatched
                left rows still yield one all-null row (LEFT OUTER).
    """
    tiebreak = tiebreak or right_cols[0]

    cell = [
        (F.floor(F.col(lc) / F.lit(float(max_dist))).cast("long"),
         F.floor(F.col(rc) / F.lit(float(max_dist))).cast("long"))
        for lc, rc in coords
    ]
    l = left.select(
        *[F.col(c) for c in left_keys],
        *[F.col(lc).alias(f"__lc{i}") for i, (lc, _) in enumerate(coords)],
        *[lcell.alias(f"__cell{i}") for i, (lcell, _) in enumerate(cell)],
    )

    # Explode right rows into their own + neighbor cells (3^d copies).
    offsets = F.array(*[
        F.struct(*[F.lit(o[i]).alias(f"o{i}") for i in range(len(coords))])
        for o in _neighbor_offsets(len(coords))
    ])
    r = (
        right.select(
            *[F.col(c) for c in right_cols],
            *[F.col(rc).alias(f"__rc{i}") for i, (_, rc) in enumerate(coords)],
            *[rcell.alias(f"__rcell{i}") for i, (_, rcell) in enumerate(cell)],
        )
        .withColumn("__off", F.explode(offsets))
        .select(
            *right_cols,
            *[F.col(f"__rc{i}") for i in range(len(coords))],
            *[(F.col(f"__rcell{i}") + F.col(f"__off.o{i}")).alias(f"__cell{i}")
              for i in range(len(coords))],
        )
    )

    dist: Column = F.sqrt(sum(
        F.pow(F.col(f"__lc{i}") - F.col(f"__rc{i}"), 2) for i in range(len(coords))
    ))
    cand = (
        l.join(r, on=[f"__cell{i}" for i in range(len(coords))])
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) < F.lit(float(max_dist)))
    )
    best = (
        cand.withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(*left_keys).orderBy(F.col(dist_col), F.col(tiebreak))
            ),
        )
        .filter(F.col("__rn") <= k)
        .select(*left_keys, *right_cols, dist_col,
                *([F.col("__rn").alias("rank")] if k > 1 else []))
    )
    # LEFT OUTER: unmatched left rows -> null right columns (core.py:166).
    return left.select(*left_keys).join(best, on=left_keys, how="left")
