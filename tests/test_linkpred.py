"""Link prediction (CN / RA / Jaccard) + assortativity vs brute-force oracles."""

from __future__ import annotations

import math

from paragrapher_spark.fixtures import (
    k_complete,
    path_graph,
    powerlaw_graph,
    small5x14,
    star_graph,
    two_components,
)
from paragrapher_spark.kernels.linkpred import (
    RA_FIXED_POINT,
    assortativity,
    link_prediction,
)


def _undirected_pairs(edges):
    return {(min(s, d), max(s, d)) for s, d in edges if s != d}


def _linkpred_oracle(edges):
    """Brute-force CN/RA-fixed-point/Jaccard over non-adjacent pairs."""
    und = _undirected_pairs(edges)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    ids = sorted(nbrs)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            if (u, v) in und:
                continue
            common = nbrs[u] & nbrs[v]
            if not common:
                continue
            cn = len(common)
            ra_fp = sum(RA_FIXED_POINT // len(nbrs[w]) for w in common)
            du, dv = len(nbrs[u]), len(nbrs[v])
            out[(u, v)] = (cn, ra_fp, du, dv, cn / (du + dv - cn))
    return out


def _assortativity_oracle(edges):
    und = _undirected_pairs(edges)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    stubs = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    n = len(stubs)
    sxy = sum(deg[a] * deg[b] for a, b in stubs)
    sx = sum(deg[a] for a, _ in stubs)
    sxx = sum(deg[a] * deg[a] for a, _ in stubs)
    return n, sxy, sx, sxx, n * sxy - sx * sx, n * sxx - sx * sx


def _lp_compare(spark, edges_df):
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    res = link_prediction(edges_df)
    got = {
        (r.u, r.v): (r.cn, r.ra_fp, r.du, r.dv, r.jaccard)
        for r in res.scores.collect()
    }
    want = _linkpred_oracle(edges)
    assert set(got) == set(want)
    for pair, (cn, ra_fp, du, dv, jac) in want.items():
        g = got[pair]
        assert g[:4] == (cn, ra_fp, du, dv), (pair, g, (cn, ra_fp, du, dv))
        assert math.isclose(g[4], jac, rel_tol=0, abs_tol=0), pair  # exact
    return got


def test_k5_no_candidates(spark):
    # complete graph: every pair already adjacent -> nothing to predict
    assert _lp_compare(spark, k_complete(spark, 5)) == {}


def test_path_graph(spark):
    # path 0-1-2-...: (i, i+2) share exactly one common neighbor
    got = _lp_compare(spark, path_graph(spark, 8))
    assert (0, 2) in got and got[(0, 2)][0] == 1


def test_star_leaf_pairs(spark):
    # every leaf pair shares exactly the hub; RA term = 1e12 // (n-1)
    got = _lp_compare(spark, star_graph(spark, 12))
    assert all(v[0] == 1 and v[1] == RA_FIXED_POINT // 11 for v in got.values())
    assert len(got) == 11 * 10 // 2


def test_two_components_and_small(spark):
    _lp_compare(spark, two_components(spark))
    _lp_compare(spark, small5x14(spark))


def test_powerlaw(spark):
    _lp_compare(spark, powerlaw_graph(spark, n=150, m=3))


def test_hub_cap_drops_loudly(spark):
    # capping below the hub degree kills every wedge in a star and the
    # dropped-center count is REPORTED (the loud-cap contract)
    res = link_prediction(star_graph(spark, 12), max_center_degree=5)
    assert res.n_dropped_centers == 1
    assert res.scores.count() == 0


def test_assortativity_star_is_minus_one(spark):
    row = assortativity(star_graph(spark, 10)).collect()[0]
    want = _assortativity_oracle(
        [(r.src, r.dst) for r in star_graph(spark, 10).collect()]
    )
    assert (row.n_stubs, row.sxy, row.sx, row.sxx, row.r_num, row.r_den) == want
    assert row.r == -1.0  # star is the canonical perfectly-disassortative graph


def test_assortativity_powerlaw_matches_oracle(spark):
    df = powerlaw_graph(spark, n=200, m=3)
    row = assortativity(df).collect()[0]
    want = _assortativity_oracle([(r.src, r.dst) for r in df.collect()])
    assert (row.n_stubs, row.sxy, row.sx, row.sxx, row.r_num, row.r_den) == want
    assert row.r == want[4] / want[5]  # the single IEEE division
