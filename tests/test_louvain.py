"""Louvain synchronous local-moving + community conductance tests."""

from __future__ import annotations

from paragrapher_spark.kernels.labelprop import community_conductance, modularity
from paragrapher_spark.kernels.louvain import louvain_level


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


_BARBELL = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]


def test_louvain_triangle_merges_to_one_community(spark):
    # hand-simulated: round 1 moves all to min-neighbor labels, round 2
    # collapses to community 0, round 3 is a fixpoint
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    res = louvain_level(e, rounds=3)
    labels = {r.id: r.community for r in res.labels.collect()}
    assert labels == {0: 0, 1: 0, 2: 0}
    assert res.history[-1]["n_communities"] == 1


def test_louvain_single_edge_merges_not_oscillates(spark):
    # the parity rule breaks the classic synchronous swap: round 1 only
    # vertex 1 (odd) moves -> both in community 0, then a fixpoint
    e = _edges(spark, [(0, 1)])
    assert {
        r.id: r.community for r in louvain_level(e, rounds=1).labels.collect()
    } == {0: 0, 1: 0}
    assert {
        r.id: r.community for r in louvain_level(e, rounds=2).labels.collect()
    } == {0: 0, 1: 0}


def test_louvain_barbell_finds_the_two_triangles(spark):
    e = _edges(spark, _BARBELL)
    res = louvain_level(e, rounds=3)
    labels = {r.id: r.community for r in res.labels.collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 3: 4, 4: 4, 5: 4}
    q = modularity(e, res.labels.select("id", "community")).collect()[0]
    # sum_ec=6 internal edges, vol 7+7 -> q_num = 4*7*6 - 98 = 70
    assert (q.sum_ec, q.q_num) == (6, 70)
    # deterministic: a second run is bit-identical
    again = louvain_level(e, rounds=3)
    assert sorted(map(tuple, res.labels.collect())) == sorted(
        map(tuple, again.labels.collect())
    )


def test_conductance_barbell_hand_values(spark):
    e = _edges(spark, _BARBELL)
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20)], "id long, label long"
    )
    got = {r.label: r for r in community_conductance(e, labels).collect()}
    # m=7; vol(each side)=7 (degrees 2,2,3); cut=1; phi = 1/min(7,7)
    for lab in (10, 20):
        r = got[lab]
        assert (r.n_vertices, r.vol, r.cut) == (3, 7, 1)
        assert r.phi == 1 / 7


def test_conductance_whole_graph_convention(spark):
    e = _edges(spark, [(0, 1), (1, 2)])
    labels = spark.createDataFrame([(0, 5), (1, 5), (2, 5)], "id long, label long")
    r = community_conductance(e, labels).collect()[0]
    assert (r.cut, r.phi) == (0, 0.0)  # min(vol, 2m-vol)=0 -> documented 0.0


def test_ppr_sweep_recovers_seed_triangle(spark):
    from paragrapher_spark.kernels.localcluster import ppr_sweep_cut

    e = _edges(spark, _BARBELL)
    rows = ppr_sweep_cut(e, seed=0, rounds=6).collect()
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    members = {r.id for r in rows if r.rank <= best[0].rank}
    assert members == {0, 1, 2}  # the ACL community around seed 0
    assert best[0].cut == 1 and best[0].vol == 7
    assert best[0].phi_fp == 10**9 // 7
    # sweep range respects the half-volume rule: no prefix beyond vol=m
    assert all(r.vol * 2 <= 14 for r in rows)
