"""Rich-club coefficient vs a brute-force python oracle.

phi(k) = 2*E_k / (N_k*(N_k-1)) for every degree value k present — the
kernel computes it with suffix sums over two histograms; the oracle
recomputes every club by direct enumeration, including the exact longs
and the single IEEE division.
"""

from __future__ import annotations

from collections import defaultdict

from paragrapher_spark.fixtures import (
    k_complete,
    powerlaw_graph,
    star_graph,
    two_components,
)
from paragrapher_spark.kernels.degrees import rich_club


def _oracle(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(us) for v, us in adj.items()}
    out = {}
    for k in sorted(set(deg.values())):
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e_k = sum(1 for a, b in und if a in club and b in club)
        n_k = len(club)
        out[k] = (n_k, e_k, float(2 * e_k) / float(n_k * (n_k - 1)))
    return out


def _got(df):
    return {r.k: (r.n_k, r.e_k, r.phi) for r in df.collect()}


def test_rich_club_matches_oracle(spark):
    for fixture in (powerlaw_graph, two_components):
        df = fixture(spark)
        edges = [(r.src, r.dst) for r in df.collect()]
        assert _got(rich_club(df)) == _oracle(edges), fixture.__name__


def test_rich_club_complete_graph(spark):
    # K5: every deg=4; no k has a club of >=2 members with deg > k
    # except k<4 -> club = all 5 vertices, phi = 1.0 (it IS a clique)
    got = _got(rich_club(k_complete(spark, 5)))
    assert got == {}  # only k=4 present as a degree value; club(4) empty


def test_rich_club_star(spark):
    # star: hub deg 9, leaves deg 1. k=1 -> club={hub}, <2 members;
    # so only... no k qualifies: club(1)={hub} alone, club(9)={}
    got = _got(rich_club(star_graph(spark, 10)))
    assert got == {}


def test_transitivity_closed_forms(spark):
    """K5: T=10, W=30, C=1.0. Star: T=0, C=0. Path of 4 vertices:
    W = 2 (two interior degree-2 vertices), T=0."""
    from paragrapher_spark.fixtures import path_graph
    from paragrapher_spark.kernels.triangles import transitivity

    row = transitivity(k_complete(spark, 5)).collect()[0]
    assert (row.triangles, row.wedges, row.transitivity) == (10, 30, 1.0)
    row = transitivity(star_graph(spark, 10)).collect()[0]
    assert row.triangles == 0 and row.transitivity == 0.0
    assert row.wedges == 9 * 8 // 2  # all wedges through the hub
    row = transitivity(path_graph(spark, 4)).collect()[0]
    assert (row.triangles, row.wedges) == (0, 2)
