"""Densest-subgraph peel (kernels/densest.py) vs a pure-python integer
replay + planted-core closed forms."""

from __future__ import annotations

from paragrapher_spark.fixtures import k_complete, path_graph, powerlaw_graph
from paragrapher_spark.kernels.densest import densest_subgraph


def _peel_replay(edges, num, den):
    """Same integer arithmetic as the kernel, pure python."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    best = None  # (m, n, round, members)
    rnd = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n, m = len(deg), len(e)
        if n == 0:
            break
        if best is None or m * best[1] > best[0] * n:
            best = (m, n, rnd, set(deg))
        keep = {v for v, d in deg.items() if d * n * den > 2 * m * (den + num)}
        e = {(a, b) for a, b in e if a in keep and b in keep}
        rnd += 1
    return best or (0, 0, 0, set())


def _run(spark, edges_df, num=1, den=2):
    res = densest_subgraph(edges_df, num, den)
    got_members = {r.id for r in res.members.collect()}
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    want_m, want_n, want_round, want_members = _peel_replay(edges, num, den)
    assert (res.best_m, res.best_n, res.best_round) == (want_m, want_n, want_round)
    assert got_members == want_members
    return res


def test_planted_clique_beats_sparse_rest(spark):
    """Disjoint path (density ~1) + K8 (density 3.5): round 0 removes the
    path (deg <= 2 < 1.5*avg), round 1 state is exactly the clique and
    wins the argmax."""
    path = [(i, i + 1) for i in range(30)]
    k8 = [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)]
    df = spark.createDataFrame(path + k8, "src long, dst long")
    res = _run(spark, df)
    assert res.best_round == 1
    assert (res.best_m, res.best_n) == (28, 8)
    assert {r.id for r in res.members.collect()} == {100 + i for i in range(8)}


def test_k5_full_graph_is_best(spark):
    res = _run(spark, k_complete(spark, 5))
    assert res.best_round == 0 and (res.best_m, res.best_n) == (10, 5)


def test_path_round0(spark):
    # regular-ish sparse graph: the first peel erases it, round 0 wins
    res = _run(spark, path_graph(spark, 10))
    assert res.best_round == 0 and res.best_n == 10


def test_powerlaw_matches_replay(spark):
    _run(spark, powerlaw_graph(spark, n=400, seed=7))


def test_empty_and_self_loops(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    res = densest_subgraph(empty)
    assert res.members.count() == 0 and res.best_n == 0
    loops = spark.createDataFrame([(3, 3)], "src long, dst long")
    res = densest_subgraph(loops)
    assert res.members.count() == 0 and res.best_n == 0
