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


# ---------------------------------------------------------------------------
# Planted customer<->part bipartite graph for the HITS / Jaccard family
# ---------------------------------------------------------------------------

#: customer -> parts (one order per customer)
_BASKETS = {
    1: [101, 102, 103, 104, 105],
    2: [101, 102, 103, 106],
    3: [104, 105],
    4: [106, 107],
    5: [107],
    6: [108],
}


def _write_bipartite(tmp_path):
    ok, ck, lk, pk = [], [], [], []
    for c, parts in _BASKETS.items():
        ok.append(c)
        ck.append(c)
        for p in parts:
            lk.append(c)
            pk.append(p)
    pd.DataFrame({"o_orderkey": ok, "o_custkey": ck}
                 ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_orderkey": lk, "l_partkey": pk}
                 ).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_hits_step_planted_bipartite(spark, tmp_path):
    """Hand-computed HITS half-steps: a1 = part degree, h1 = sum of a1
    over the basket, a2 = sum of h1 over the buyers."""
    sf = _write_bipartite(tmp_path)
    rows = get("q_hits_step").fn(spark, sf).collect()
    hubs = [(r.node, r.score) for r in rows if r.kind == "hub"]
    auths = [(r.node, r.score) for r in rows if r.kind == "authority"]
    # a1: 101-107 have degree 2, 108 degree 1
    # h1: c1=10, c2=8, c3=4, c4=4, c5=2, c6=1 (ties break on node id)
    assert hubs == [(1, 10), (2, 8), (3, 4), (4, 4), (5, 2), (6, 1)]
    # a2: 101/102/103 = 18, 104/105 = 14, 106 = 12, 107 = 6, 108 = 1
    assert auths == [(101, 18), (102, 18), (103, 18), (104, 14),
                     (105, 14), (106, 12), (107, 6), (108, 1)]


def test_jaccard_linkpred_planted_bipartite(spark, tmp_path):
    """Hand-computed Jaccard on the capped universe (parts with >= 2
    buyers; part 108 drops): only (c1,c2) and (c1,c3) share >= 2."""
    sf = _write_bipartite(tmp_path)
    rows = get("q_jaccard_linkpred").fn(spark, sf).collect()
    got = [(r.ck_a, r.ck_b, r.n_shared, r.n_union, r.jaccard)
           for r in rows]
    assert got == [(1, 2, 3, 6, 0.5), (1, 3, 2, 5, 0.4)]


def test_powerlaw_alpha_recovers_planted_exponent(spark, tmp_path):
    """Degrees planted from an exact discrete power law cnt(d) ~ d^-2.5
    over d = 3..60: the CSN MLE must (a) equal the numpy mirror of the
    exact pico-quantized formula and (b) recover alpha ~ 2.5."""
    alpha_true = 2.5
    degrees = []
    for d in range(3, 61):
        cnt = int(round(4000 * d ** (-alpha_true)))
        degrees += [d] * cnt
    ok, ck, lk, pk = [], [], [], []
    oid = 0
    for j, d in enumerate(degrees):
        for c in range(d):
            oid += 1
            ok.append(oid)
            ck.append(c + 1)
            lk.append(oid)
            pk.append(1000 + j)
    pd.DataFrame({"o_orderkey": ok, "o_custkey": ck}
                 ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_orderkey": lk, "l_partkey": pk}
                 ).to_parquet(tmp_path / "lineitem.parquet")
    out = get("q_powerlaw_alpha").fn(spark, str(tmp_path)).collect()[0]
    # numpy mirror: pico-quantized ln per distinct degree
    n = len(degrees)
    s_pico = sum(int(np.floor(np.log(d / 2.5) * 1e12 + 0.5))
                 for d in degrees)
    want = round(1.0 + n / (s_pico / 1e12), 6)
    assert out.n_tail == n and out.x_min == 3
    assert out.d_max == max(degrees)  # counts round to 0 past d ~ 36
    assert abs(out.alpha - want) < 1e-9
    assert abs(out.alpha - alpha_true) < 0.25  # planted exponent
    assert abs(out.se - round((want - 1) / np.sqrt(n), 5)) < 1e-4
