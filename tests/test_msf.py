"""Boruvka MSF (kernels/msf.py) vs a pure-python Kruskal on the same
composite (weight, a, b) order — the MSF is unique under that order, so
the two algorithms must produce the identical edge set."""

from __future__ import annotations

from paragrapher_spark.fixtures import powerlaw_graph
from paragrapher_spark.kernels.msf import boruvka_msf
from pyspark.sql import functions as F


def _kruskal(edges):
    """edges: (a, b, w) canonical rows, min-collapsed."""
    best: dict[tuple[int, int], int] = {}
    for a, b, w in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        best[k] = min(best.get(k, w), w)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    msf = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            msf.add((a, b, w))
    return msf


def _compare(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    res = boruvka_msf(df)
    got = {(r.a, r.b, r.weight) for r in res.edges.collect()}
    want = _kruskal([(r[0], r[1], r[2]) for r in rows])
    assert got == want, (sorted(got), sorted(want))
    assert res.n_edges == len(want)
    assert res.total_weight == sum(w for _, _, w in want)
    return res


def test_textbook_square_with_diagonal(spark):
    rows = [(0, 1, 1), (1, 2, 2), (2, 3, 3), (0, 3, 4), (0, 2, 5)]
    res = _compare(spark, rows)
    assert res.total_weight == 6  # 1 + 2 + 3


def test_forest_two_components(spark):
    rows = [(0, 1, 5), (1, 2, 1), (0, 2, 2), (10, 11, 7), (11, 12, 7), (10, 12, 7)]
    res = _compare(spark, rows)
    assert res.n_edges == 4  # 2 per triangle-component


def test_duplicate_and_reversed_edges_min_collapse(spark):
    rows = [(0, 1, 9), (1, 0, 2), (0, 1, 5), (1, 2, 3), (2, 2, 1)]
    res = _compare(spark, rows)
    assert res.total_weight == 5  # (0,1,2) + (1,2,3); self-loop dropped


def test_equal_weights_tie_break_by_edge(spark):
    # all weights equal: composite order (w, a, b) makes the MSF unique
    rows = [(a, b, 7) for a in range(5) for b in range(a + 1, 5)]
    _compare(spark, rows)


def test_powerlaw_deterministic_weights(spark):
    e = powerlaw_graph(spark, n=250, seed=13).select(
        "src", "dst", ((F.col("src") * 31 + F.col("dst") * 17) % 97 + 1).alias("weight")
    )
    rows = [(r.src, r.dst, r.weight) for r in e.collect()]
    _compare(spark, rows)


def test_empty(spark):
    df = spark.createDataFrame([], "src long, dst long, weight long")
    res = boruvka_msf(df)
    assert res.n_edges == 0 and res.total_weight == 0 and res.rounds == 0


def test_affinity_clusters_levels(spark):
    """Level-k affinity clusters = Boruvka round-k components: at level 1
    on a path with distinct weights, each vertex hooks through its min
    incident edge; deeper levels coarsen monotonically (each cluster is a
    union of previous-level clusters)."""
    # valley weights: light (2i,2i+1) edges are local minima, heavy odd
    # edges only bridge — level 1 pairs up, level 2 merges the pairs
    w = [1, 9, 2, 8, 3, 7, 4]  # path 0-..-7
    rows = [(i, i + 1, w[i]) for i in range(7)]
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    lvl1 = boruvka_msf(df, max_rounds=1).clusters
    lvl2 = boruvka_msf(df, max_rounds=2).clusters
    c1 = {r.id: r.c for r in lvl1.collect()}
    c2 = {r.id: r.c for r in lvl2.collect()}
    # level 1: each even vertex pairs with its light neighbor
    assert c1[0] == c1[1] and c1[2] == c1[3] and c1[4] == c1[5] and c1[6] == c1[7]
    assert len(set(c1.values())) == 4
    assert len(set(c1.values())) > len(set(c2.values()))  # coarsening
    # monotone: same level-1 cluster => same level-2 cluster
    for i in c1:
        for j in c1:
            if c1[i] == c1[j]:
                assert c2[i] == c2[j]
