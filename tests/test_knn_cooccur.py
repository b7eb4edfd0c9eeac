"""avg_neighbor_degree (knn(k) profile) and cooccurrence_counts vs
brute-force python oracles.

knn(k) — edge-weighted mean neighbor degree per degree class: the oracle
enumerates every (endpoint, other-end) incidence directly, keeping the
numerator/denominator as exact ints and the final knn as the same single
IEEE division the kernel performs.

cooccurrence — the oracle slides the window over each document's token
list in pure python and counts ordered pairs exactly.
"""

from __future__ import annotations

from collections import defaultdict

from paragrapher_spark.fixtures import (
    k_complete,
    powerlaw_graph,
    star_graph,
    two_components,
)
from paragrapher_spark.functions.text import cooccurrence_counts
from paragrapher_spark.kernels.degrees import avg_neighbor_degree


def _knn_oracle(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(us) for v, us in adj.items()}
    s_k: dict[int, int] = defaultdict(int)
    n_k: dict[int, int] = defaultdict(int)
    for v, d in deg.items():
        n_k[d] += 1
        for u in adj[v]:
            s_k[d] += deg[u]
    return {
        k: (n_k[k], s_k[k], float(s_k[k]) / float(k * n_k[k])) for k in n_k
    }


def _knn_got(df):
    return {r.k: (r.n_k, r.s_k, r.knn) for r in df.collect()}


def test_knn_profile_matches_oracle(spark):
    for fixture in (powerlaw_graph, two_components):
        df = fixture(spark)
        edges = [(r.src, r.dst) for r in df.collect()]
        assert _knn_got(avg_neighbor_degree(df)) == _knn_oracle(edges), (
            fixture.__name__
        )


def test_knn_profile_complete_graph(spark):
    # K5: all degrees 4, every neighbor has degree 4 -> knn(4) = 4.0
    got = _knn_got(avg_neighbor_degree(k_complete(spark, 5)))
    assert got == {4: (5, 5 * 4 * 4, 4.0)}


def test_knn_profile_star(spark):
    # star n=11: hub deg 10 (neighbors all deg 1 -> knn=1), leaves deg 1
    # (neighbor = hub deg 10 -> knn=10) — maximal disassortativity
    got = _knn_got(avg_neighbor_degree(star_graph(spark, 11)))
    assert got == {10: (1, 10, 1.0), 1: (10, 100, 10.0)}


def _cooc_oracle(docs, window, min_count):
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for _did, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                counts[(a, toks[j])] += 1
    return {p: n for p, n in counts.items() if n >= min_count}


_DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate   the rat"),  # double spaces -> empty tokens dropped
    (2, "cat cat cat"),
    (3, ""),
    (4, "solo"),
]


def test_cooccurrence_matches_oracle(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for window, min_count in ((1, 1), (2, 1), (3, 2)):
        got = {
            (r.a, r.b): r.n
            for r in cooccurrence_counts(
                df, window=window, min_count=min_count
            ).collect()
        }
        assert got == _cooc_oracle(_DOCS, window, min_count), (
            window,
            min_count,
        )


def test_cooccurrence_window_is_forward_only(spark):
    # "a b": (a,b) within window 1, never (b,a)
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    got = {
        (r.a, r.b): r.n
        for r in cooccurrence_counts(df, window=1, min_count=1).collect()
    }
    assert got == {("a", "b"): 1}


def test_cooccurrence_rejects_bad_window(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    try:
        cooccurrence_counts(df, window=0)
    except ValueError as e:
        assert "window" in str(e)
    else:
        raise AssertionError("window=0 must raise")


def test_quotient_graph(spark):
    from paragrapher_spark.graph import quotient_graph

    edges = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 3), (1, 2, 1), (2, 3, 5), (3, 0, 7)],
        "src long, dst long, weight long",
    )
    # groups: {0,1} -> "a", {2,3} -> "b"
    mapping = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "id long, group string"
    )
    got = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(edges, mapping, weight_col="weight").collect()
    }
    # a->b: (0,2,w3)+(1,2,w1)=4 ; b->a: (3,0,w7)=7 ; self loops dropped
    assert got == {("a", "b"): 4, ("b", "a"): 7}
    got_n = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(edges, mapping).collect()
    }
    assert got_n == {("a", "b"): 2, ("b", "a"): 1}  # counts, not sums
    with_loops = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(
            edges, mapping, weight_col="weight", drop_self_loops=False
        ).collect()
    }
    assert with_loops[("a", "a")] == 2 and with_loops[("b", "b")] == 5


def _brute_project(pairs, cap):
    arcs = {(s, d) for s, d in pairs if s != d}
    indeg = defaultdict(int)
    for _, d in arcs:
        indeg[d] += 1
    out = defaultdict(int)
    for d in {d for _, d in arcs}:
        if indeg[d] > cap:
            continue
        srcs = sorted(s for s, dd in arcs if dd == d)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                out[(srcs[i], srcs[j])] += 1
    return dict(out)


def test_bipartite_project_matches_brute_force(spark):
    from paragrapher_spark.graph import bipartite_project

    pairs = [(0, 9), (1, 9), (2, 9), (0, 8), (2, 8), (3, 7), (3, 7),
             (4, 4), (1, 8), (5, 6)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r.a, r.b): r.weight for r in bipartite_project(edges, cap=10).collect()}
    assert got == _brute_project(pairs, cap=10)


def test_bipartite_project_hub_cap_drops_loudly(spark):
    from paragrapher_spark.graph import bipartite_project

    # dst 99 referenced by 5 sources (> cap 3) must be excluded AND counted
    pairs = [(i, 99) for i in range(5)] + [(0, 1), (2, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    m: dict = {}
    got = {(r.a, r.b): r.weight
           for r in bipartite_project(edges, cap=3, metrics=m).collect()}
    assert got == {(0, 2): 1}
    assert m["n_dropped_dsts"] == 1 and m["n_dropped_refs"] == 5
