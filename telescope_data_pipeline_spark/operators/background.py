"""Local (annulus) background estimation — the reference's ``bkg_sub``
(core.py:344-382), Spark-first.

Reference semantics: for every star, take the pixels in a ring
(r_in <= d < r_out) around its position, use their median as the local
sky background, and subtract it from the star's flux. The reference
loops stars and slices a NumPy array; the relational generalization is
"for each left row, aggregate the right rows inside a distance ring" —
an all-pairs distance predicate that at scale must NOT run as a cross
join.

Rewrite (same grid trick as operators.nn_join): bucket both sides on
floor(coord / r_out); every right point within r_out of a left point
sits in the left point's cell or an adjacent one, so exploding the
right side into its 3^d neighbor cells and EQUI-joining on cell id
covers the ring exactly. The inner/outer radius predicate refines, then
a groupBy on the left key computes the ring median. Cost is
|right|·3^d duplicated rows + one hash shuffle, not |left|·|right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .nn_join import _neighbor_offsets


def ring_agg(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    coords: list[tuple[str, str]],
    r_in: float,
    r_out: float,
    value_col: str,
    agg_alias: str = "bkg",
) -> DataFrame:
    """Per-left-row median of ``right.value_col`` over the distance ring
    ``r_in <= d < r_out``. LEFT OUTER on the left keys: rows with an
    empty ring keep a null background (the reference falls back to the
    global median in that case — callers coalesce as needed).

    Returns ``left_keys + [agg_alias, n_ring]``.
    """
    dims = len(coords)
    cell = [
        (F.floor(F.col(lc) / F.lit(float(r_out))).cast("long"),
         F.floor(F.col(rc) / F.lit(float(r_out))).cast("long"))
        for lc, rc in coords
    ]
    l = left.select(
        *left_keys,
        *[F.col(lc).alias(f"__lc{i}") for i, (lc, _) in enumerate(coords)],
        *[lcell.alias(f"__cell{i}") for i, (lcell, _) in enumerate(cell)],
    )
    offsets = F.array(*[
        F.struct(*[F.lit(o[i]).alias(f"o{i}") for i in range(dims)])
        for o in _neighbor_offsets(dims)
    ])
    r = (
        right.select(
            F.col(value_col).alias("__val"),
            *[F.col(rc).alias(f"__rc{i}") for i, (_, rc) in enumerate(coords)],
            *[rcell.alias(f"__rcell{i}") for i, (_, rcell) in enumerate(cell)],
        )
        .withColumn("__off", F.explode(offsets))
        .select(
            "__val",
            *[F.col(f"__rc{i}") for i in range(dims)],
            *[(F.col(f"__rcell{i}") + F.col(f"__off.o{i}")).alias(f"__cell{i}")
              for i in range(dims)],
        )
    )
    dist = F.sqrt(sum(
        F.pow(F.col(f"__lc{i}") - F.col(f"__rc{i}"), 2) for i in range(dims)
    ))
    ring = (
        l.join(r, on=[f"__cell{i}" for i in range(dims)])
        .withColumn("__d", dist)
        .filter((F.col("__d") >= F.lit(float(r_in)))
                & (F.col("__d") < F.lit(float(r_out))))
        .groupBy(*left_keys)
        .agg(F.median("__val").alias(agg_alias),
             F.count(F.lit(1)).alias("n_ring"))
    )
    return left.select(*left_keys).join(ring, on=left_keys, how="left")
