"""Planted-graph ground truth for the co-purchase graph family: a
lineitem fixture whose %4-sampled co-purchase graph is a KNOWN small
graph (a K4 clique, a 2-path, a triangle with a pendant, an isolated
edge), so triangle counts, clustering coefficients, the 3-core, and
degree assortativity can be checked against hand-computed values —
the textbook check the DuckDB oracle (same formula) cannot provide."""

from __future__ import annotations

import numpy as np
import pandas as pd

from telescope_data_pipeline_spark.queries import get

#: order -> parts (parts %4 != 0 must be filtered out by the queries)
_ORDERS = {
    1: [4, 8, 12, 16, 5],     # K4 on {4,8,12,16}; part 5 filtered
    2: [20, 24],
    3: [24, 28, 7],           # path 20-24-28
    4: [32, 36, 40],          # triangle
    5: [40, 44],              # pendant on 40
    6: [48, 52],              # isolated edge
}

#: the resulting undirected edge set
_EDGES = [(4, 8), (4, 12), (4, 16), (8, 12), (8, 16), (12, 16),
          (20, 24), (24, 28),
          (32, 36), (32, 40), (36, 40),
          (40, 44), (48, 52)]


def _write_lineitem(tmp_path):
    ok, pk = [], []
    for o, parts in _ORDERS.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    pd.DataFrame({"l_orderkey": ok, "l_partkey": pk}
                 ).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def _degrees():
    deg = {}
    for u, v in _EDGES:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_triangle_count_planted_graph(spark, tmp_path):
    sf = _write_lineitem(tmp_path)
    rows = get("q_triangle_count").fn(spark, sf).collect()
    # 4 triangles in the K4 + 1 standalone = 5, bucketed by id
    assert sum(r.n_triangles for r in rows) == 5


def test_clustering_coeff_planted_graph(spark, tmp_path):
    sf = _write_lineitem(tmp_path)
    out = {r.node: r for r in
           get("q_clustering_coeff").fn(spark, sf).collect()}
    deg = _degrees()
    want_cc = {4: 1.0, 8: 1.0, 12: 1.0, 16: 1.0,   # clique
               24: 0.0,                            # open path center
               32: 1.0, 36: 1.0,                   # triangle corners
               40: 1 / 3}                          # triangle + pendant
    assert set(out) == set(want_cc)                # exactly deg >= 2
    for node, cc in want_cc.items():
        assert out[node].degree == deg[node], node
        assert abs(out[node].clustering_coeff - round(cc, 6)) < 1e-9, node
    want_tri = {4: 3, 8: 3, 12: 3, 16: 3, 24: 0, 32: 1, 36: 1, 40: 1}
    for node, t in want_tri.items():
        assert out[node].n_triangles == t, node


def test_kcore_planted_graph(spark, tmp_path):
    sf = _write_lineitem(tmp_path)
    rows = get("q_kcore").fn(spark, sf).collect()
    # only the K4 survives the 3-core peel; all four nodes keep deg 3
    assert [(r.degree, r.n_nodes) for r in rows] == [(3, 4)]


def test_assortativity_planted_graph(spark, tmp_path):
    sf = _write_lineitem(tmp_path)
    out = get("q_assortativity").fn(spark, sf).collect()[0]
    deg = _degrees()
    dx, dy = [], []
    for u, v in _EDGES:
        dx += [deg[u], deg[v]]
        dy += [deg[v], deg[u]]
    want = np.corrcoef(dx, dy)[0, 1]
    assert out.n_edges == len(_EDGES)
    assert abs(out.assortativity - want) < 1e-6
