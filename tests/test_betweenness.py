"""Brandes betweenness kernel vs an exact pure-python Brandes oracle.

σ (shortest-path counts) must match as exact integers; δ-derived scores
to 1e-9 (the kernel computes the same per-level arithmetic, only the
float summation order differs).
"""

from __future__ import annotations

from collections import deque

import pytest

from paragrapher_spark.kernels.betweenness import betweenness
from paragrapher_spark.sources.edges import md5_vertex_graph


def _brandes(edges, sources, directed=False):
    adj: dict[int, list[int]] = {}
    all_e = list(edges) + ([] if directed else [(d, s) for s, d in edges])
    tmp: dict[int, set[int]] = {}
    for s, d in set(all_e):
        tmp.setdefault(s, set()).add(d)
    adj = {k: sorted(v) for k, v in tmp.items()}
    bc: dict[int, float] = {}
    sig_all = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        delta = {v: 0.0 for v in dist}
        for v in reversed(order):
            for w in adj.get(v, []):
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                bc[v] = bc.get(v, 0.0) + delta[v]
        for v in dist:
            sig_all[(s, v)] = (dist[v], sigma[v])
    return bc, sig_all


_DIAMOND = [(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (0, 5), (2, 6)]


@pytest.mark.parametrize("directed", [False, True])
def test_betweenness_matches_pure_brandes(spark, directed):
    e = spark.createDataFrame(_DIAMOND, "src long, dst long")
    res = betweenness(e, [0, 2, 5], directed=directed)
    got_sig = {(r.source, r.id): (r.dist, r.sigma) for r in res.levels.collect()}
    exp_bc, exp_sig = _brandes(_DIAMOND, [0, 2, 5], directed=directed)
    assert got_sig == exp_sig  # σ and dist are EXACT integers
    got_bc = {r.id: r.bc for r in res.scores.collect()}
    for k in set(got_bc) | set(exp_bc):
        assert got_bc.get(k, 0.0) == pytest.approx(exp_bc.get(k, 0.0), abs=1e-9)


def test_betweenness_md5_graph_all_sources(spark):
    # every vertex as a source on a random digraph = EXACT betweenness
    g = md5_vertex_graph(spark, 40, out_deg=2)
    edges = [(r.src, r.dst) for r in g.collect()]
    verts = sorted({v for e_ in edges for v in e_})
    res = betweenness(g, verts, directed=True)
    exp_bc, exp_sig = _brandes(edges, verts, directed=True)
    got_sig = {(r.source, r.id): (r.dist, r.sigma) for r in res.levels.collect()}
    assert got_sig == exp_sig
    got_bc = {r.id: r.bc for r in res.scores.collect()}
    for k in set(got_bc) | set(exp_bc):
        assert got_bc.get(k, 0.0) == pytest.approx(exp_bc.get(k, 0.0), abs=1e-9)


def test_betweenness_path_graph_analytic(spark):
    # path 0-1-2-3-4 from all sources: interior vertex v's dependency sum
    # is (#s<v pairs crossing v) known in closed form; just pin the classic
    # result bc(v) = 2 * (v)(4 - v) for the undirected path with all
    # sources (each unordered pair counted twice, no division ambiguity)
    e = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    res = betweenness(e, [0, 1, 2, 3, 4], directed=False)
    got = {r.id: r.bc for r in res.scores.collect()}
    exp = {v: 2.0 * v * (4 - v) for v in range(5) if 0 < v < 4}
    for v, x in exp.items():
        assert got[v] == pytest.approx(x)
    assert res.depth == 4
    assert [h["level"] for h in res.history][:4] == [1, 2, 3, 4]


def test_betweenness_disconnected_sources(spark):
    # sources in separate components never contribute across components
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 12)], "src long, dst long"
    )
    res = betweenness(e, [0, 10], directed=False)
    got = {r.id: r.bc for r in res.scores.collect()}
    assert got == {1: pytest.approx(1.0), 11: pytest.approx(1.0), 2: pytest.approx(0.0), 12: pytest.approx(0.0)} or all(
        got.get(v, 0.0) <= 1.0 for v in got
    )
    exp_bc, _ = _brandes([(0, 1), (1, 2), (10, 11), (11, 12)], [0, 10])
    for k in set(got) | set(exp_bc):
        assert got.get(k, 0.0) == pytest.approx(exp_bc.get(k, 0.0), abs=1e-9)


def test_harmonic_centrality_exact_fractions(spark):
    from fractions import Fraction

    from paragrapher_spark.kernels.betweenness import (
        harmonic_centrality,
        shortest_path_levels,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]  # path graph
    e = spark.createDataFrame(edges, "src long, dst long")
    levels, depth, hist = shortest_path_levels(e, [0, 4], directed=False)
    assert depth == 4
    out = harmonic_centrality(levels, depth)
    got = {r.id: Fraction(r.h_num, r.h_den) for r in out.collect()}
    # h(v) over sources {0,4}: exact unit-fraction sums, v != s excluded
    _, sig = _brandes(edges, [0, 4])
    exp: dict[int, Fraction] = {}
    for (s, v), (dist, _) in sig.items():
        if dist > 0:
            exp[v] = exp.get(v, Fraction(0)) + Fraction(1, dist)
    assert got == exp
    # integer-exactness: lcm scaling leaves no remainder for any dist
    for r in out.collect():
        assert r.h_den % 1 == 0 and r.h_num > 0


def test_closeness_centrality_exact(spark):
    from paragrapher_spark.kernels.betweenness import (
        closeness_centrality,
        shortest_path_levels,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]  # path graph
    e = spark.createDataFrame(edges, "src long, dst long")
    levels, depth, _hist = shortest_path_levels(e, [0, 4], directed=False)
    got = {
        r.id: (r.reached, r.dist_sum, r.closeness)
        for r in closeness_centrality(levels).collect()
    }
    # exact integers from the python BFS, closeness = one IEEE division
    _, sig = _brandes(edges, [0, 4])
    exp: dict[int, list[int]] = {}
    for (s, v), (dist, _) in sig.items():
        if dist > 0:
            acc = exp.setdefault(v, [0, 0])
            acc[0] += 1
            acc[1] += dist
    assert got == {
        v: (r, d, float(r) / float(d)) for v, (r, d) in exp.items()
    }
    # path closed form: vertex 2 sees both ends at distance 2
    assert got[2] == (2, 4, 0.5)


def _edge_brandes(edges, sources):
    """Pure-python Girvan–Newman edge betweenness (undirected)."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    adj = {k: sorted(v) for k, v in adj.items()}
    ebc = {e: 0.0 for e in und}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        delta = {v: 0.0 for v in dist}
        for v in reversed(order):
            for w in adj.get(v, []):
                if dist.get(w) == dist[v] + 1:
                    c = sigma[v] / sigma[w] * (1 + delta[w])
                    delta[v] += c
                    ebc[tuple(sorted((v, w)))] += c
    return ebc


def test_edge_betweenness_matches_pure_brandes(spark):
    from paragrapher_spark.kernels.betweenness import edge_betweenness

    e = spark.createDataFrame(_DIAMOND, "src long, dst long")
    srcs = [0, 2, 5]
    res = edge_betweenness(e, srcs)
    got = {(r.a, r.b): r.ebc for r in res.scores.collect()}
    want = _edge_brandes(_DIAMOND, srcs)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_edge_betweenness_path_closed_form(spark):
    """Path 0-1-2-3, all sources: edge (i,i+1) lies on the unique s-t
    path for every s<=i<t, so its credit is (i+1)*(n-1-i) counting both
    directions over all-source Brandes."""
    from paragrapher_spark.kernels.betweenness import edge_betweenness

    n = 4
    path = [(i, i + 1) for i in range(n - 1)]
    e = spark.createDataFrame(path, "src long, dst long")
    res = edge_betweenness(e, list(range(n)))
    got = {(r.a, r.b): r.ebc for r in res.scores.collect()}
    want = {(i, i + 1): float((i + 1) * (n - 1 - i) * 2) for i in range(n - 1)}
    assert got == want


def test_edge_betweenness_zero_credit_edges_kept(spark):
    """A source set that reaches nothing beyond its component still
    yields a full edge scoring: the other component's edges appear at
    exactly 0.0 (the Girvan-Newman peel needs a total scoring)."""
    from paragrapher_spark.kernels.betweenness import edge_betweenness

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long"
    )
    res = edge_betweenness(e, [0])
    got = {(r.a, r.b): r.ebc for r in res.scores.collect()}
    assert got[(10, 11)] == 0.0
    assert got[(0, 1)] == 2.0 and got[(1, 2)] == 1.0
