"""Connected components vs a driver-side union-find ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from telescope_data_pipeline_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.full
def test_components_match_union_find(spark):
    rng = np.random.default_rng(13)
    nodes = list(range(200))
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (150, 2)) if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _union_find(edges, {n for e in edges for n in e})
    # min-label convention: representative is the min node id per component
    canon_want = {}
    by_root: dict[int, list[int]] = {}
    for n, r in want.items():
        by_root.setdefault(r, []).append(n)
    for members in by_root.values():
        m = min(members)
        for n in members:
            canon_want[n] = m
    assert got == canon_want


def test_dedup_clusters_transitive(spark):
    """A~B, B~C (but never A~C): exactly one of {A,B,C} survives."""
    data = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_clusters(data, pairs, "doc_id").collect())
    assert kept == [0, 3, 4, 5, 7, 8, 9]


# ---------------------------------------------------------------------------
# Iterated PageRank goldens (operators/pagerank.py)
# ---------------------------------------------------------------------------

@pytest.mark.full
def test_pagerank_converges_and_sums_to_one(spark):
    from pyspark.sql import functions as F

    from telescope_data_pipeline_spark.operators.pagerank import (
        pagerank_iterate,
    )

    # path graph 0-1-2-3 (symmetrized) + a dangling node 4 fed by 3
    e = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4)]
    edges = spark.createDataFrame(e, "src long, dst long")
    pr = {r["node"]: r["pagerank"]
          for r in pagerank_iterate(edges, max_iter=30, tol=1e-8).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-6   # mass conserved (dangling fix)
    assert all(v > 0 for v in pr.values())
    # symmetric centrality: ends of the path tie, middle nodes dominate ends
    assert pr[1] > pr[0] and pr[2] > pr[0]


def test_pagerank_uniform_on_regular_graph(spark):
    from telescope_data_pipeline_spark.operators.pagerank import (
        pagerank_iterate,
    )

    # directed 4-cycle: every node identical by symmetry -> rank 1/4
    e = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(e, "src long, dst long")
    pr = pagerank_iterate(edges, max_iter=30, tol=1e-8).collect()
    for r in pr:
        assert abs(r["pagerank"] - 0.25) < 1e-6, r
