"""k-truss decomposition vs an exact python peel oracle."""

from __future__ import annotations

from collections import defaultdict

import pytest

from paragrapher_spark.fixtures import (
    k_complete,
    path_graph,
    powerlaw_graph,
    two_components,
)
from paragrapher_spark.kernels.ktruss import ktruss


def _canon(edges):
    return {(min(s, d), max(s, d)) for s, d in edges if s != d}


def ktruss_oracle(edges, k: int) -> dict[tuple[int, int], int]:
    """Iterative support peel → {edge: fixpoint support}."""
    es = _canon(edges)
    while True:
        adj = defaultdict(set)
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in es}
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            return sup
        es = keep


def _edges(df):
    return [(r.src, r.dst) for r in df.select("src", "dst").collect()]


def _got(res):
    return {(r.a, r.b): r.support for r in res.edges.collect()}


@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_powerlaw_matches_oracle(spark, k):
    df = powerlaw_graph(spark)
    assert _got(ktruss(df, k=k)) == ktruss_oracle(_edges(df), k)


def test_ktruss_two_components(spark):
    df = two_components(spark)
    assert _got(ktruss(df, k=3)) == ktruss_oracle(_edges(df), 3)


def test_ktruss_complete_graph_closed_form(spark):
    # K6: every edge lies on exactly 4 triangles -> the whole graph is the
    # 6-truss (support 4 >= 6-2) and the 7-truss is empty
    df = k_complete(spark, 6)
    got = _got(ktruss(df, k=6))
    assert len(got) == 15 and set(got.values()) == {4}
    assert ktruss(df, k=7).edges.count() == 0


def test_ktruss_triangle_free_is_empty(spark):
    # a path has no triangles: k>=3 peels everything
    assert ktruss(path_graph(spark, 8), k=3).edges.count() == 0


def test_ktruss_k2_keeps_all_edges(spark):
    df = powerlaw_graph(spark)
    assert set(_got(ktruss(df, k=2))) == _canon(_edges(df))


def test_ktruss_nested_in_kcore(spark):
    # every k-truss is a subgraph of the (k-1)-core (Cohen 2008)
    from paragrapher_spark.kernels.kcore import kcore

    df = powerlaw_graph(spark)
    truss_verts = set()
    for r in ktruss(df, k=4).edges.collect():
        truss_verts |= {r.a, r.b}
    core_verts = {r.id for r in kcore(df, k=3).vertices.collect()}
    assert truss_verts <= core_verts


def test_ktruss_invalid_k_raises(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        ktruss(path_graph(spark, 4), k=1)


def test_ktruss_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="max_rounds"):
        ktruss(powerlaw_graph(spark), k=4, max_rounds=1)
