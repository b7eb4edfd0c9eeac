"""1-WL color refinement (kernels/wl.py) vs a pure-python replay and the
classic closed forms (mirror symmetry on paths, WL-blindness on regular
graphs)."""

from __future__ import annotations

from paragrapher_spark.fixtures import (
    cycle_graph,
    k_complete,
    path_graph,
    powerlaw_graph,
    star_graph,
)
from paragrapher_spark.kernels.wl import wl_refinement


def _wl_replay(edges, rounds):
    """Same canonicalization as the kernel: rank distinct (color, nsig)
    by (numeric color, nsig string), identity past the fixpoint."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    color = {v: len(ns) for v, ns in adj.items()}
    prev = None
    for _ in range(rounds):
        pairs = {
            v: (color[v], ",".join(str(c) for c in sorted(color[u] for u in adj[v])))
            for v in adj
        }
        rank = {p: i for i, p in enumerate(sorted(set(pairs.values())))}
        color = {v: rank[pairs[v]] for v in adj}
        n = len(rank)
        if prev is not None and n == prev:
            break
        prev = n
    return color


def _compare(spark, edges_df, rounds=3):
    res = wl_refinement(edges_df, rounds=rounds)
    got = {r.id: r.color for r in res.colors.collect()}
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    assert got == _wl_replay(edges, rounds)
    return res


def test_path_mirror_symmetry(spark):
    """1-WL cannot break a path's mirror symmetry: i and n-1-i share a
    color forever; positions refine to ceil(n/2) stable classes."""
    res = _compare(spark, path_graph(spark, 6), rounds=6)
    got = {r.id: r.color for r in res.colors.collect()}
    assert got[0] == got[5] and got[1] == got[4] and got[2] == got[3]
    assert res.n_colors == 3 and res.stable


def test_regular_graphs_are_wl_blind(spark):
    """Every vertex of a connected regular graph keeps one color — the
    textbook 1-WL limitation (C6 is indistinguishable from 2xC3)."""
    res = _compare(spark, cycle_graph(spark, 6), rounds=4)
    assert res.n_colors == 1 and res.stable
    res_k = _compare(spark, k_complete(spark, 5), rounds=4)
    assert res_k.n_colors == 1


def test_star_two_classes(spark):
    res = _compare(spark, star_graph(spark, 8), rounds=3)
    assert res.n_colors == 2


def test_powerlaw_matches_replay(spark):
    _compare(spark, powerlaw_graph(spark, n=300, seed=3), rounds=3)


def test_early_stop_equals_fixed_unroll(spark):
    """The sound-early-stop contract the oracle relies on: stopping at
    the class-count fixpoint yields the same coloring as running the
    full unroll."""
    e = path_graph(spark, 7)
    short = wl_refinement(e, rounds=10)  # stabilizes well before 10
    assert short.stable and short.rounds < 10
    full = _wl_replay([(i, i + 1) for i in range(6)], 10)
    assert {r.id: r.color for r in short.colors.collect()} == full
