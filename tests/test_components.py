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


def _py_bipartite(pairs):
    """BFS 2-coloring replay: per component (min-id root), min-dist
    parity sides, conflicts = same-side canonical edges."""
    from collections import deque

    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    ids = sorted(adj)
    comp, dist = {}, {}
    for r in ids:
        if r in comp:
            continue
        comp[r], dist[r] = r, 0
        q = deque([r])
        while q:
            v = q.popleft()
            for u in sorted(adj[v]):
                if u not in comp:
                    comp[u], dist[u] = r, dist[v] + 1
                    q.append(u)
    canon = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    out = {}
    for r in set(comp.values()):
        n = sum(1 for v in comp if comp[v] == r)
        c = sum(
            1 for a, b in canon
            if comp[a] == r and dist[a] % 2 == dist[b] % 2
        )
        out[r] = (n, c, c == 0)
    return out


def test_bipartite_check_matches_python_replay(spark):
    from paragrapher_spark.kernels.components import bipartite_check

    # even 6-cycle (bipartite) + triangle (odd cycle) + path (bipartite)
    pairs = (
        [(i, (i + 1) % 6) for i in range(6)]
        + [(10, 11), (11, 12), (10, 12)]
        + [(20, 21), (21, 22)]
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["component"]: (r["n_vertices"], r["n_conflicts"], r["is_bipartite"])
        for r in bipartite_check(edges).collect()
    }
    assert got == _py_bipartite(pairs)
    assert got[0][2] and got[20][2] and not got[10][2]


def test_bipartite_check_odd_cycle_conflict_count(spark):
    from paragrapher_spark.kernels.components import bipartite_check

    # 5-cycle: exactly one same-parity edge under BFS from vertex 0
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    [row] = bipartite_check(edges).collect()
    assert (row["n_conflicts"], row["is_bipartite"]) == (1, False)


def test_bipartite_check_loud_when_depth_too_small(spark):
    import pytest as _pytest

    from paragrapher_spark.kernels.components import bipartite_check

    pairs = [(i, i + 1) for i in range(6)]  # path of length 6
    edges = spark.createDataFrame(pairs, "src long, dst long")
    with _pytest.raises(RuntimeError, match="max_depth"):
        bipartite_check(edges, max_depth=2)


def test_incremental_components_matches_cold_run(spark):
    """incremental_components: warm-merge of a delta into the previous
    star forest is BIT-IDENTICAL to a cold run on the full edge set, in
    fewer (or equal) contraction rounds, including a delta that bridges
    two previously separate components and introduces new vertices."""
    from pyspark.sql import functions as F

    from paragrapher_spark.kernels.components import (
        connected_components,
        incremental_components,
    )

    # two chains + an isolated pair; delta bridges the chains and adds
    # a brand-new vertex 100 hanging off vertex 0
    old_edges = [(0, 1), (1, 2), (10, 11), (11, 12), (20, 21)]
    delta_edges = [(2, 10), (0, 100)]
    old_df = spark.createDataFrame(old_edges, "src long, dst long")
    delta_df = spark.createDataFrame(delta_edges, "src long, dst long")
    full_df = old_df.unionByName(delta_df)

    prev = connected_components(old_df)
    cold = connected_components(full_df)
    warm = incremental_components(prev.components, delta_df)

    got_c = {(r.id, r.component) for r in cold.components.collect()}
    got_w = {(r.id, r.component) for r in warm.components.collect()}
    assert got_w == got_c
    assert warm.rounds <= cold.rounds
    # the merged chain takes the global min label (0), new vertex joins it
    labels = dict(got_w)
    assert labels[12] == 0 and labels[100] == 0 and labels[21] == 20


def test_incremental_components_empty_delta(spark):
    """An empty delta must reproduce the previous labeling verbatim."""
    from paragrapher_spark.kernels.components import (
        connected_components,
        incremental_components,
    )

    old_df = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    prev = connected_components(old_df)
    empty = spark.createDataFrame([], "src long, dst long")
    warm = incremental_components(prev.components, empty)
    assert {(r.id, r.component) for r in warm.components.collect()} == {
        (r.id, r.component) for r in prev.components.collect()
    }


def test_decremental_components_split_matches_cold_run(spark):
    """decremental_components: removing edges that SPLIT a component and
    ISOLATE a vertex must be bit-identical to a cold run on the reduced
    edge set, with untouched components' labels reused verbatim."""
    from pyspark.sql import functions as F

    from paragrapher_spark.kernels.components import (
        connected_components,
        decremental_components,
    )

    # one long chain, one triangle, one untouched pair
    full = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    removed = [(2, 3), (10, 11), (10, 12)]  # splits the chain; 10 keeps 11-12 via... no: removing 10-11 and 10-12 isolates 10
    full_df = spark.createDataFrame(full, "src long, dst long")
    rem_df = spark.createDataFrame(removed, "src long, dst long")
    remaining = full_df.exceptAll(rem_df)

    prev = connected_components(full_df)
    warm = decremental_components(prev.components, remaining, rem_df)
    cold = connected_components(
        remaining,
        vertices=full_df.select(F.col("src").alias("id"))
        .unionByName(full_df.select(F.col("dst").alias("id")))
        .distinct(),
    )
    got_w = {(r.id, r.component) for r in warm.components.collect()}
    got_c = {(r.id, r.component) for r in cold.components.collect()}
    assert got_w == got_c
    labels = dict(got_w)
    # chain split: 0-1-2 keeps 0; 3-4 relabels to 3; 10 isolated singleton
    assert labels[2] == 0 and labels[3] == 3 and labels[4] == 3
    assert labels[10] == 10 and labels[11] == 11 and labels[12] == 11
    # untouched component label reused verbatim
    assert labels[20] == 20 and labels[21] == 20


def test_decremental_components_untouched_labels_not_recomputed(spark):
    """Components without a removed edge must pass through the warm path
    untouched — the affected-set carve keeps work local."""
    from paragrapher_spark.kernels.components import (
        connected_components,
        decremental_components,
    )

    full_df = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long"
    )
    rem_df = spark.createDataFrame([(10, 11)], "src long, dst long")
    remaining = full_df.exceptAll(rem_df)
    prev = connected_components(full_df)
    warm = decremental_components(prev.components, remaining, rem_df)
    labels = {r.id: r.component for r in warm.components.collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 10: 10, 11: 11}
