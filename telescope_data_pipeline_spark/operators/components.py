"""Connected components over near-duplicate pair graphs.

Dedup needs CLUSTERS, not pairs: if A~B and B~C, one representative
should survive even though A~C was never directly found. This is
connected components over the candidate-pair edge list — computed with
the standard large-graph label-propagation scheme (iterate: every node
takes the min label among itself and its neighbors; converges in
O(diameter) rounds — the HashMin/"large-star" approach of
Kiveris et al., public algorithm), expressed entirely as DataFrame
joins + aggregations so it scales with the shuffle, not driver memory.

Near-dup graphs have tiny diameters (clusters are cliques-ish), so the
bounded iteration count is safe; convergence is checked and iteration
stops early when labels are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 50) -> DataFrame:
    """(src, dst) undirected edge list -> (id, component) with component =
    min node id in the component.

    Each iteration: labels flow across edges both ways, every node keeps
    the minimum seen. Early-exits when an iteration changes nothing.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("component", F.col("id")))
    for _ in range(max_iters):
        # neighbor labels: for each node u, the labels of all its neighbors
        neigh = (sym.join(labels.withColumnRenamed("id", "v"), on="v")
                 .groupBy("u").agg(F.min("component").alias("n_comp"))
                 .withColumnRenamed("u", "id"))
        new_labels = (labels.join(neigh, on="id", how="left")
                      .select("id", F.least("component",
                                            F.coalesce("n_comp", "component"))
                              .alias("component")))
        new_labels = new_labels.localCheckpoint()  # truncate iterative lineage
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), on="id")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str,
                   src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Apply transitive dedup: rows of ``df`` minus all non-representative
    members of each near-dup component (keep = min id per component).
    Rows in no pair survive untouched."""
    comp = connected_components(pairs, src=src, dst=dst)
    drop = comp.filter(F.col("id") != F.col("component")) \
               .select(F.col("id").alias(id_col))
    return df.join(drop, on=id_col, how="left_anti")
