"""k-core peeling + clustering coefficient vs python oracles."""

from __future__ import annotations

import pytest

from paragrapher_spark.fixtures import k_complete, powerlaw_graph, two_components
from paragrapher_spark.kernels.kcore import kcore
from paragrapher_spark.kernels.triangles import clustering_coefficient


def _edges(df):
    return [(r.src, r.dst) for r in df.collect()]


def _kcore_oracle(edges, k):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return set(adj)


def test_kcore_k5_complete(spark):
    df = k_complete(spark, 5)  # every vertex has degree 4
    res = kcore(df, k=4)
    assert {r.id for r in res.vertices.collect()} == {0, 1, 2, 3, 4}
    assert kcore(df, k=5).vertices.count() == 0


def test_kcore_powerlaw_matches_oracle(spark):
    df = powerlaw_graph(spark)
    edges = _edges(df)
    for k in (2, 3):
        got = {r.id for r in kcore(df, k=k).vertices.collect()}
        assert got == _kcore_oracle(edges, k), k


def test_kcore_two_components(spark):
    df = two_components(spark)
    edges = _edges(df)
    got = {r.id for r in kcore(df, k=2).vertices.collect()}
    assert got == _kcore_oracle(edges, 2)


def test_clustering_coefficient_oracle(spark):
    df = powerlaw_graph(spark)
    edges = _edges(df)
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    for v, ns in adj.items():
        if len(ns) < 2:
            continue
        t = sum(1 for a in ns for b in ns if a < b and b in adj.get(a, set()))
        want[v] = (len(ns), t, round(2.0 * t / (len(ns) * (len(ns) - 1)), 6))
    got = {
        r.id: (r.degree, r.triangles, r.coeff)
        for r in clustering_coefficient(df).collect()
    }
    assert got == want


def test_clustering_k5_is_one(spark):
    got = {r.id: r.coeff for r in clustering_coefficient(k_complete(spark, 5)).collect()}
    assert got == {v: 1.0 for v in range(5)}
