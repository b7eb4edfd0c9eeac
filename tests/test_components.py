"""Connected components vs union-find oracle (exact-match contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from paragrapher_spark.fixtures import (
    cycle_graph,
    k_complete,
    path_graph,
    powerlaw_graph,
    star_graph,
    two_components,
)
from paragrapher_spark.kernels.components import component_sizes, connected_components
from tests.oracles import wcc_oracle


def _compare(spark, edges_df, vertices=None):
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    res = connected_components(edges_df, vertices=vertices)
    assert res.converged
    got = {r.id: r.component for r in res.components.collect()}
    want = wcc_oracle(edges)
    assert got == want
    # sizes sum to |V| (reference invariant test2:279)
    sizes = component_sizes(res.components)
    assert sizes.agg(F.sum("size")).collect()[0][0] == len(want)
    return res


def test_path(spark):
    res = _compare(spark, path_graph(spark, 10))
    # long path is the worst case for naive min-propagation; large/small star
    # must converge in O(log^2 n) rounds, far fewer than n-1
    assert res.rounds < 9


def test_cycle(spark):
    _compare(spark, cycle_graph(spark, 12))


def test_two_components(spark):
    res = _compare(spark, two_components(spark))
    sizes = {r.component: r.size for r in component_sizes(res.components).collect()}
    assert sizes == {0: 4, 10: 6}


def test_star_skew(spark):
    _compare(spark, star_graph(spark, 501))


def test_k5(spark):
    _compare(spark, k_complete(spark, 5))


def test_powerlaw(spark):
    _compare(spark, powerlaw_graph(spark, n=500, m=2))


def test_isolated_vertices(spark):
    edges = path_graph(spark, 4)
    vertices = spark.createDataFrame([(i,) for i in range(8)], "id long")
    res = connected_components(edges, vertices=vertices)
    got = {r.id: r.component for r in res.components.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 6, 7: 7}
