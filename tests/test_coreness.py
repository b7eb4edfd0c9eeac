"""Full core decomposition (H-index iteration) vs exact python oracles.

Two independent replays pin the kernel:

- the classic sequential peel (repeatedly remove a minimum-degree vertex,
  its core number = the running k when it leaves) — the textbook coreness
  definition the H-index fixpoint must equal (Lu et al. 2016, Thm 1);
- a round-by-round H-index simulation from degrees, checking the kernel's
  convergence round count matches the simulated fixpoint exactly.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from paragrapher_spark.fixtures import (
    cycle_graph,
    k_complete,
    path_graph,
    powerlaw_graph,
    star_graph,
    two_components,
)
from paragrapher_spark.kernels.coreness import coreness


def _adj(edges):
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s == d:
            continue
        adj[s].add(d)
        adj[d].add(s)
    return adj


def peel_coreness_oracle(edges) -> dict[int, int]:
    """Textbook peel: repeatedly delete a minimum-degree vertex."""
    adj = {v: set(us) for v, us in _adj(edges).items()}
    core: dict[int, int] = {}
    k = 0
    while adj:
        v = min(adj, key=lambda x: (len(adj[x]), x))
        k = max(k, len(adj[v]))
        core[v] = k
        for u in adj[v]:
            adj[u].discard(v)
        del adj[v]
    return core


def _hindex(vals) -> int:
    h = 0
    for i, v in enumerate(sorted(vals, reverse=True), start=1):
        if v >= i:
            h = i
    return h


def hindex_replay_oracle(edges) -> tuple[dict[int, int], int]:
    """Round-by-round H-index iteration → (fixpoint values, #rounds).

    Round count convention matches the kernel: the terminating round is
    the first whose application changes nothing (it still runs, and its
    no-change observation IS the convergence proof).
    """
    adj = _adj(edges)
    cur = {v: len(us) for v, us in adj.items()}
    rnd = 0
    while True:
        rnd += 1
        nxt = {v: _hindex([cur[u] for u in adj[v]]) for v in adj}
        if nxt == cur:
            return cur, rnd
        cur = nxt


def _edges(df):
    return [(r.src, r.dst) for r in df.select("src", "dst").collect()]


@pytest.mark.parametrize(
    "fixture",
    [path_graph, cycle_graph, two_components, powerlaw_graph],
    ids=["path", "cycle", "two_components", "powerlaw"],
)
def test_coreness_matches_both_oracles(spark, fixture):
    df = fixture(spark)
    edges = _edges(df)
    res = coreness(df)
    got = {r.id: r.coreness for r in res.vertices.collect()}
    assert got == peel_coreness_oracle(edges)
    want_vals, want_rounds = hindex_replay_oracle(edges)
    assert got == want_vals
    assert res.rounds == want_rounds
    assert len(res.history) == res.rounds
    assert res.history[-1]["changed"] == 0


def test_coreness_complete_graph(spark):
    # K6: every vertex has coreness 5, converged straight from degrees
    res = coreness(k_complete(spark, 6))
    assert {r.coreness for r in res.vertices.collect()} == {5}
    assert res.rounds == 1


def test_coreness_star(spark):
    # star: H-index needs a round to pull the center down from its degree
    res = coreness(star_graph(spark, 50))
    got = {r.id: r.coreness for r in res.vertices.collect()}
    assert set(got.values()) == {1}
    assert len(got) == 50  # hub 0 + spokes 1..49


def test_coreness_bounded_by_kcore_membership(spark):
    # consistency with the existing single-k peel kernel: the k-core's
    # member set == {v : coreness(v) >= k}
    from paragrapher_spark.kernels.kcore import kcore

    df = powerlaw_graph(spark)
    core = {r.id: r.coreness for r in coreness(df).vertices.collect()}
    for k in (2, 3, 4):
        members = {r.id for r in kcore(df, k=k).vertices.collect()}
        assert members == {v for v, c in core.items() if c >= k}, k


def test_coreness_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="max_rounds"):
        coreness(star_graph(spark, 10), max_rounds=0)
