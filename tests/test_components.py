"""Connected components vs a driver-side union-find ground truth."""

from __future__ import annotations

import numpy as np

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
