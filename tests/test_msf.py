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
