"""SSSP, HyperBall, HITS kernels vs exact python/numpy oracles."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from paragrapher_spark.fixtures import (
    k_complete,
    powerlaw_graph,
    small5x14,
    star_graph,
    two_components,
)
from paragrapher_spark.kernels.hits import hits
from paragrapher_spark.kernels.hyperball import (
    EST_NUM,
    LN_TABLE,
    M,
    RHO_CAP,
    SMALL_RANGE,
    hyperball,
)
from paragrapher_spark.kernels.sssp import sssp


def _weighted(spark, rows):
    return spark.createDataFrame(
        [(int(s), int(d), int(w)) for s, d, w in rows],
        "src long, dst long, weight long",
    )


def _dijkstra(edges, sources, directed):
    import heapq

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        dv, v = heapq.heappop(pq)
        if dv > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = dv + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------


def test_sssp_directed_matches_dijkstra(spark):
    rows = [
        (0, 1, 7), (0, 2, 1), (2, 1, 2), (1, 3, 1),
        (2, 3, 10), (3, 4, 1), (0, 4, 100), (5, 0, 1),
    ]
    res = sssp(_weighted(spark, rows), [0], max_iter=20)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == _dijkstra(rows, [0], True)  # vertex 5 unreachable -> absent
    assert res.converged


def test_sssp_undirected_multisource(spark):
    rows = [(0, 1, 3), (1, 2, 4), (2, 3, 5), (3, 4, 1), (10, 11, 2)]
    res = sssp(_weighted(spark, rows), [0, 10], directed=False, max_iter=20)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == _dijkstra(rows, [0, 10], False)


def test_sssp_parallel_edges_take_min(spark):
    rows = [(0, 1, 9), (0, 1, 2), (1, 2, 9), (1, 2, 3)]
    res = sssp(_weighted(spark, rows), [0], max_iter=10)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {0: 0, 1: 2, 2: 5}


def test_sssp_equals_bfs_on_unit_weights(spark):
    from paragrapher_spark.kernels.bfs import bfs

    edges = powerlaw_graph(spark, n=300, m=3)
    w = edges.withColumn("weight", F.lit(1).cast("long"))
    src = [0]
    d_sssp = {r.id: r.dist for r in sssp(w, src, directed=False).distances.collect()}
    d_bfs = {r.id: r.dist for r in bfs(edges, src, directed=False).distances.collect()}
    assert d_sssp == d_bfs


def test_sssp_history_frontier_empties(spark):
    rows = [(0, 1, 1), (1, 2, 1)]
    res = sssp(_weighted(spark, rows), [0], max_iter=10)
    assert res.history[-1]["frontier_size"] == 0
    assert [h["frontier_size"] for h in res.history[:-1]] == [1, 1]


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------


def _rs(x, digits=6):
    """Spark-equivalent round: shortest decimal repr, HALF_UP (Catalyst's
    Round converts double via BigDecimal.decimal = Double.toString)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
        )
    )


def _hash60(v, tag="hb", seed=42):
    return int(hashlib.md5(f"{tag}:{seed}:{v}".encode()).hexdigest()[:15], 16)


def _regs(v):
    h = _hash60(v)
    reg = h % M
    rest = h >> 4
    if rest == 0:
        rho = RHO_CAP
    else:
        rho = min(1 + (rest & -rest).bit_length() - 1, RHO_CAP)
    return reg, rho


def _estimate(regs):
    denom = sum(1 << (RHO_CAP - r) for r in regs)
    raw = EST_NUM / float(denom)
    zeros = sum(1 for r in regs if r == 0)
    if raw <= SMALL_RANGE and zeros > 0:
        return LN_TABLE[zeros - 1]
    return raw


def _hyperball_oracle(edges, radius, directed=False):
    """Exact replay of the kernel's defined semantics: per-vertex HLL
    registers merged along edges for `radius` rounds."""
    adj = {}
    verts = set()
    for s, d in edges:
        verts.update((s, d))
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    state = {}
    for v in verts:
        regs = [0] * M
        reg, rho = _regs(v)
        regs[reg] = rho
        state[v] = regs
    est = {v: _rs(_estimate(state[v])) for v in verts}
    harmonic = {v: 0.0 for v in verts}
    nf = [sum(int(_rs(e, 0)) for e in est.values())]
    for r in range(1, radius + 1):
        new_state = {}
        for v in verts:
            regs = list(state[v])
            for u in adj.get(v, ()):  # gather from out-neighbors
                regs = [max(a, b) for a, b in zip(regs, state[u])]
            new_state[v] = regs
        state = new_state
        for v in verts:
            ne = _rs(_estimate(state[v]))
            # integer-rounded ball deltas (see kernels/hyperball.py)
            harmonic[v] = harmonic[v] + (_rs(ne, 0) - _rs(est[v], 0)) / float(r)
            est[v] = ne
        nf.append(sum(int(_rs(e, 0)) for e in est.values()))
    return est, {v: _rs(h) for v, h in harmonic.items()}, nf


def test_hyperball_matches_exact_replay(spark):
    df = powerlaw_graph(spark, n=400, m=3)
    edges = [(r.src, r.dst) for r in df.collect()]
    res = hyperball(df, radius=3)
    want_ball, want_h, want_nf = _hyperball_oracle(edges, 3)
    got = {r.id: (r.ball, r.harmonic) for r in res.states.collect()}
    assert res.nf == want_nf
    assert got == {v: (want_ball[v], want_h[v]) for v in want_ball}


def test_hyperball_directed_star(spark):
    # star hub->spokes: hub's 1-ball covers everything, spokes see only
    # themselves (directed); estimates are deterministic given the hash
    df = star_graph(spark, n=50)
    edges = [(r.src, r.dst) for r in df.collect()]
    res = hyperball(df, radius=1, directed=True)
    want_ball, _, want_nf = _hyperball_oracle(edges, 1, directed=True)
    got = {r.id: r.ball for r in res.states.collect()}
    assert got == want_ball
    assert res.nf == want_nf


def test_hyperball_ball_saturates_on_k_complete(spark):
    # K6: radius-1 ball of every vertex is the whole graph; radius 2 must
    # not change any estimate (fixpoint), so harmonic deltas are 0
    df = k_complete(spark, 6)
    r1 = hyperball(df, radius=1)
    r2 = hyperball(df, radius=2)
    b1 = {r.id: r.ball for r in r1.states.collect()}
    b2 = {r.id: r.ball for r in r2.states.collect()}
    assert b1 == b2
    assert r2.nf[1] == r2.nf[2]


def test_hyperball_estimate_accuracy_two_components(spark):
    # m=16 registers => ~26% relative stddev; just sanity-check the
    # saturated estimates land in the right ballpark per component
    df = two_components(spark)
    res = hyperball(df, radius=6)
    balls = {r.id: r.ball for r in res.states.collect()}
    for v in (0, 1, 2, 3):  # K4 component, true ball 4
        assert 1 <= balls[v] <= 12
    for v in range(10, 16):  # path-6 component, true ball 6
        assert 2 <= balls[v] <= 18


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _hits_oracle(edges, iters):
    verts = sorted({v for e in edges for v in e})
    hub = {v: 1.0 for v in verts}
    auth = {v: 0.0 for v in verts}
    for _ in range(iters):
        auth = {v: 0.0 for v in verts}
        for s, d in edges:
            auth[d] += hub[s]
        hub = {v: 0.0 for v in verts}
        for s, d in edges:
            hub[s] += auth[d]
    na = sum(auth.values()) or 1.0
    nh = sum(hub.values()) or 1.0
    return (
        {v: round(auth[v] / na, 6) for v in verts},
        {v: round(hub[v] / nh, 6) for v in verts},
    )


def test_hits_small5x14(spark):
    df = small5x14(spark)
    edges = [(r.src, r.dst) for r in df.collect()]
    res = hits(df, iterations=8)
    want_a, want_h = _hits_oracle(edges, 8)
    got = {r.id: (r.authority, r.hub) for r in res.scores.collect()}
    for v, (a, h) in got.items():
        assert abs(a - want_a[v]) < 1e-9, v
        assert abs(h - want_h[v]) < 1e-9, v


def test_hits_powerlaw_close_to_oracle(spark):
    df = powerlaw_graph(spark, n=300, m=3)
    edges = [(r.src, r.dst) for r in df.collect()]
    res = hits(df, iterations=6)
    want_a, want_h = _hits_oracle(edges, 6)
    got = {r.id: (r.authority, r.hub) for r in res.scores.collect()}
    assert set(got) == set(want_a)
    for v, (a, h) in got.items():
        assert abs(a - want_a[v]) < 1e-6, v
        assert abs(h - want_h[v]) < 1e-6, v


def test_hits_sink_and_source_get_zero_sides(spark):
    # 0 -> 1 -> 2: vertex 0 never earns authority, vertex 2 never hub
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.id: (r.authority, r.hub) for r in hits(df, iterations=4).scores.collect()}
    assert got[0][0] == 0.0
    assert got[2][1] == 0.0
    assert abs(sum(a for a, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in got.values()) - 1.0) < 1e-9
