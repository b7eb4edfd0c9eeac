"""Named deterministic test graphs with known answers (FIXTURES.md §3).

The reference tests against a tiny bundled 5-vertex/14-arc BVGraph
(`test/datasets/small.{graph,properties}`) plus downloaded real graphs;
these are the seeded in-process equivalents. Edge lists are generated as
plain Python lists (they are test inputs, not engine code paths) and
handed to Spark via createDataFrame.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession


def _df(spark: SparkSession, edges: list[tuple[int, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )


def path_graph(spark: SparkSession, n: int = 10) -> DataFrame:
    return _df(spark, [(i, i + 1) for i in range(n - 1)])


def cycle_graph(spark: SparkSession, n: int = 10) -> DataFrame:
    return _df(spark, [(i, (i + 1) % n) for i in range(n)])


def star_graph(spark: SparkSession, n: int = 1001) -> DataFrame:
    """Hub 0 -> spokes 1..n-1: the skew fixture (degree n-1 at the hub)."""
    return _df(spark, [(0, i) for i in range(1, n)])


def k_complete(spark: SparkSession, n: int = 5) -> DataFrame:
    """Complete directed graph on n vertices (both directions);
    C(n,3) undirected triangles — 10 for K5."""
    return _df(spark, [(i, j) for i in range(n) for j in range(n) if i != j])


def two_components(spark: SparkSession) -> DataFrame:
    """Disjoint K4 (vertices 0-3) ∪ path of 6 (vertices 10-15)."""
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j]
    p6 = [(10 + i, 11 + i) for i in range(5)]
    return _df(spark, k4 + p6)


def dangling_graph(spark: SparkSession) -> DataFrame:
    """Path 0->1->2->3 plus 3 has no out-edges and isolated-ish sinks:
    exercises PageRank dangling-mass redistribution."""
    return _df(spark, [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3)])


def powerlaw_graph(
    spark: SparkSession, n: int = 2000, m: int = 5, seed: int = 42
) -> DataFrame:
    """Seeded preferential-attachment digraph, |E| ≈ n*m.

    Deterministic given the seed (python's Mersenne Twister); new vertex i
    links to m targets sampled ∝ current in-degree+1.
    """
    rng = random.Random(seed)
    targets: list[int] = [0]  # multiset for preferential sampling
    edges: set[tuple[int, int]] = set()
    for i in range(1, n):
        picked: set[int] = set()
        for _ in range(m):
            t = targets[rng.randrange(len(targets))]
            if t != i:
                picked.add(t)
        edges.update((i, t) for t in picked)
        targets.extend(picked)
        targets.append(i)
    return _df(spark, sorted(edges))


SMALL_5X14 = [
    (0, 1), (0, 2), (0, 3), (0, 4),
    (1, 0), (1, 2),
    (2, 0), (2, 3), (2, 4),
    (3, 1), (3, 4),
    (4, 0), (4, 1), (4, 2),
]


def small5x14(spark: SparkSession) -> DataFrame:
    """5 vertices / 14 arcs — homage to the reference's bundled
    `test/datasets/small.properties` (nodes=5, arcs=14)."""
    return _df(spark, SMALL_5X14)
