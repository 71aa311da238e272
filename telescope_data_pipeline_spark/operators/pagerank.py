"""Iterated PageRank, Spark-first — the generalization of the
oracle-pinned two-step anchor (queries/retrieval.py::q_pagerank), the
way operators/kmeans.py generalizes q_kmeans_step and
operators/components.py generalizes q_cluster_components.

Each iteration is the relational Pregel step: ranks equi-join edges on
the source, contributions groupBy the destination (map-side combined),
plus the damping base. State between iterations is ONE |V|-row rank
table — nothing driver-side except the scalar L1 delta used for early
stopping (a 1-row aggregate, the bounded-state rule every iterative
operator here follows).

Dangling nodes (out-degree 0) leak mass; standard fix applied: their
aggregate rank is redistributed uniformly each iteration via a 1-row
broadcast scalar, so the ranks keep summing to 1 (golden-tested).

Scale: iterations reuse the same hash partitioning on node — on a
cluster, co-partitioned rank/edge tables (bucketing.py) make every
iteration after the first shuffle-free on the edge side; hub skew takes
the salted two-stage aggregation (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_iterate"]


def pagerank_iterate(edges: DataFrame, damping: float = 0.85,
                     max_iter: int = 20, tol: float = 1e-6) -> DataFrame:
    """Run PageRank until the L1 rank delta drops below ``tol`` (or
    ``max_iter``). ``edges``: (src, dst) directed pairs. Returns
    (node, pagerank).

    The rank table is eagerly localCheckpoint-ed each iteration: unlike
    cache(), this TRUNCATES the lineage, so the logical plan stays
    one-iteration deep instead of nesting every prior iteration (the
    iterative-lineage trap — a cached-but-unpersisted 50-deep plan tree
    OOMs the driver during analysis long before any data moves). The
    L1 delta is the only driver-side value.
    """
    nodes = (edges.select(F.col("src").alias("node"))
             .unionAll(edges.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()  # one bounded action; |V| scalar drives the base
    base = (1.0 - damping) / n

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = (nodes.select("node", F.lit(1.0 / n).alias("r"))
             .localCheckpoint(eager=True))

    for _ in range(max_iter):
        # mass from dangling nodes (no out-edges), redistributed evenly
        dangling = (ranks.join(deg.withColumnRenamed("src", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")))
        contrib = (edges.join(deg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("r") / F.col("outdeg")).alias("c"))
                   .withColumnRenamed("dst", "node"))
        new_ranks = (nodes.join(contrib, "node", "left")
                     .crossJoin(F.broadcast(dangling))
                     .select("node",
                             (F.lit(base)
                              + damping * (F.coalesce(F.col("c"), F.lit(0.0))
                                           + F.col("dm") / n)).alias("r"))
                     ).localCheckpoint(eager=True)
        delta = (new_ranks.join(ranks.withColumnRenamed("r", "r0"), "node")
                 .agg(F.sum(F.abs(F.col("r") - F.col("r0"))).alias("d"))
                 .first()["d"])
        ranks = new_ranks
        if delta < tol:
            break
    return ranks.select("node", F.col("r").alias("pagerank"))
