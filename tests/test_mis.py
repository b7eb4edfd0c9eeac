"""Maximal independent set (deterministic Luby) vs exact python oracles.

Two independent replays pin the kernel:

- the sequential greedy over vertices sorted by (md5-priority, id) — the
  lexicographically-first MIS the fixed-priority Luby rounds converge to;
- a round-by-round Luby simulation, checking the per-member ``round``
  column exactly (not just the member set).
"""

from __future__ import annotations

import hashlib
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
from paragrapher_spark.kernels.mis import maximal_independent_set


def _h(v: int, seed: int = 42) -> int:
    return int(hashlib.md5(f"mis:{seed}:{v}".encode()).hexdigest()[:15], 16)


def _adj(edges):
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s == d:
            continue
        adj[s].add(d)
        adj[d].add(s)
    return adj


def greedy_mis_oracle(edges, seed: int = 42) -> set[int]:
    """Sequential greedy over the (h, id) total order."""
    adj = _adj(edges)
    mis: set[int] = set()
    blocked: set[int] = set()
    for v in sorted(adj, key=lambda v: (_h(v, seed), v)):
        if v not in blocked:
            mis.add(v)
            blocked.add(v)
            blocked |= adj[v]
    return mis


def luby_replay_oracle(edges, seed: int = 42) -> dict[int, int]:
    """Round-by-round Luby simulation → {member id: deciding round}."""
    adj = _adj(edges)
    undecided = set(adj)
    decided: dict[int, int] = {}
    rnd = 0
    while undecided:
        rnd += 1
        winners = {
            v
            for v in undecided
            if all(
                (_h(v, seed), v) < (_h(u, seed), u)
                for u in adj[v]
                if u in undecided
            )
        }
        assert winners, "fixed-priority Luby always decides >=1 vertex/round"
        for w in winners:
            decided[w] = rnd
        excluded = set().union(*(adj[w] for w in winners))
        undecided -= winners
        undecided -= excluded
    return decided


def _edges(df):
    return [(r.src, r.dst) for r in df.select("src", "dst").collect()]


@pytest.mark.parametrize(
    "fixture",
    [path_graph, cycle_graph, two_components, powerlaw_graph],
    ids=["path", "cycle", "two_components", "powerlaw"],
)
def test_mis_matches_both_oracles(spark, fixture):
    df = fixture(spark)
    edges = _edges(df)
    res = maximal_independent_set(df)
    got = {r.id: r.round for r in res.members.collect()}
    want = luby_replay_oracle(edges)
    assert got == want  # member set AND deciding round, exactly
    # the fixpoint is the lexicographically-first MIS
    assert set(got) == greedy_mis_oracle(edges)
    assert res.rounds == max(want.values())
    assert len(res.history) == res.rounds


def test_mis_independence_and_maximality(spark):
    df = powerlaw_graph(spark)
    edges = _edges(df)
    adj = _adj(edges)
    mis = {r.id for r in maximal_independent_set(df).members.collect()}
    for v in mis:  # independence: no edge inside the set
        assert not (adj[v] & mis), v
    for v in set(adj) - mis:  # maximality: every outsider has a member nbr
        assert adj[v] & mis, v


def test_mis_complete_graph_single_member(spark):
    df = k_complete(spark, 6)
    res = maximal_independent_set(df)
    members = [r.id for r in res.members.collect()]
    assert len(members) == 1
    assert members[0] == min(range(6), key=lambda v: (_h(v), v))
    assert res.rounds == 1


def test_mis_star_center_or_leaves(spark):
    # star: MIS is either {center} or all leaves, decided by priority
    df = star_graph(spark, 50)
    mis = {r.id for r in maximal_independent_set(df).members.collect()}
    assert mis == greedy_mis_oracle(_edges(df))


def test_mis_unconverged_raises(spark):
    df = path_graph(spark, 12)
    with pytest.raises(RuntimeError, match="max_rounds"):
        maximal_independent_set(df, max_rounds=0)
