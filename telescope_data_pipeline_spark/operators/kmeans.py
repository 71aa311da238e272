"""Lloyd's k-means over an embedding column, Spark-first.

The assignment step is the IVF assigner's shape (operators/similarity.py)
generalized: k centroids broadcast against the corpus, one distance per
(vector, centroid), argmin per vector. The update step is one
map-side-combined groupBy over (cluster, dimension) — shuffle volume is
k·dim partial sums per map task, never the vectors themselves. The
driver holds only the k·dim centroid matrix between iterations (the
bounded-state rule every iterative operator here follows: compare the
HashMin components loop and the IVF centroid sample).

``q_kmeans_step`` (queries/llm.py) pins ONE Lloyd iteration to a DuckDB
value oracle — deterministic first-k init, squared-L2 argmin with a
rounded distance key and cid tiebreak so float fold order can never flip
an assignment across engines. The iterated form here is golden-tested
(SSE monotonically non-increasing, stable fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_clusters", "kmeans_iterate", "sse"]


def _d2(vec_col: str, cvec_col) -> "F.Column":
    """Squared L2 distance between two array columns, as a JVM-side
    zip_with + left fold (no Python in the loop)."""
    return F.aggregate(
        F.zip_with(vec_col, cvec_col,
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)


def assign_clusters(e: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    k distances per vector, argmin via min_by on a (rounded-d2, cid)
    struct — one broadcast join, one groupBy(id) shuffle. The distance
    is rounded to 6 digits before the argmin so engines whose float
    folds differ in the last ulp still pick the same centroid (cid
    breaks exact ties deterministically)."""
    pairs = e.join(F.broadcast(centroids))
    key = F.struct(F.round(_d2(vec_col, "cvec"), 6).alias("d2"),
                   F.col("cid"))
    return (pairs.groupBy(id_col, vec_col)
            .agg(F.min_by("cid", key).alias("cid"),
                 F.round(F.min(key["d2"]), 6).alias("d2")))


def _update(assigned: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """New centroids: per-(cluster, dimension) mean — |n|·dim exploded
    rows reduced map-side to k·dim groups."""
    dims = assigned.select(
        "cid", F.posexplode(F.transform(
            vec_col, lambda x: x.cast("double"))).alias("pos", "val"))
    return (dims.groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("centroid_val"),
                 F.count(F.lit(1)).cast("long").alias("n_members")))


def kmeans_step(e: DataFrame, centroids: DataFrame,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """One Lloyd iteration: assign + update. Returns the flat
    (cid, pos, centroid_val, n_members) table — k·dim rows, the only
    state the next iteration needs."""
    return _update(assign_clusters(e, centroids, id_col, vec_col), vec_col)


def _centroids_df(e: DataFrame, flat_rows) -> DataFrame:
    """Fold the flat (cid, pos, centroid_val) rows back into a k-row
    (cid, cvec) DataFrame — a k·dim driver fold, bounded by design."""
    by_cid: dict[int, list[tuple[int, float]]] = {}
    for r in flat_rows:
        by_cid.setdefault(r["cid"], []).append((r["pos"], r["centroid_val"]))
    data = [(cid, [v for _, v in sorted(vals)])
            for cid, vals in sorted(by_cid.items())]
    return e.sparkSession.createDataFrame(data, "cid long, cvec array<double>")


def kmeans_iterate(e: DataFrame, k: int = 8, iters: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Run up to ``iters`` Lloyd iterations from the deterministic
    first-k init, stopping early at the fixed point (centroid matrix
    unchanged — assignments then cannot change either); returns the
    final assignment (id, cid, d2). Per iteration the driver holds
    k·dim floats; the cluster does one broadcast join + one (cid, pos)
    groupBy — linear, no growing lineage (each round starts from a
    fresh createDataFrame of the centroid matrix, so the plan does not
    deepen with the iteration count)."""
    cent = (e.orderBy(id_col).limit(k)
            .select(F.col(id_col).alias("cid"),
                    F.transform(vec_col,
                                lambda x: x.cast("double")).alias("cvec")))
    prev = None
    for _ in range(iters):
        flat = kmeans_step(e, cent, id_col, vec_col).collect()
        state = sorted((r["cid"], r["pos"], r["centroid_val"])
                       for r in flat)
        if state == prev:
            break
        prev = state
        cent = _centroids_df(e, flat)
    return assign_clusters(e, cent, id_col, vec_col)


def sse(assigned: DataFrame) -> float:
    """Within-cluster sum of squared distances of an assignment."""
    return assigned.agg(F.sum("d2")).first()[0]
