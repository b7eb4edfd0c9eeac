"""Dyad census + triad motifs (kernels/census.py) vs hand oracles."""

from __future__ import annotations

from paragrapher_spark.kernels.census import dyad_census, triad_motifs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_dyad_census_hand_graph(spark):
    # 0<->1 mutual; 0->2 asym; 2->3 asym; self-loop and duplicate ignored
    e = _edges(spark, [(0, 1), (1, 0), (0, 2), (2, 3), (2, 3), (3, 3)])
    row = dyad_census(e, n_vertices=4).collect()[0]
    assert (row.n_vertices, row.mutual, row.asym, row.null_dyads) == (4, 1, 2, 3)


def test_dyad_census_empty(spark):
    e = _edges(spark, []).limit(0)
    row = dyad_census(e, n_vertices=3).collect()[0]
    assert (row.mutual, row.asym, row.null_dyads) == (0, 0, 3)


def test_triad_motifs_transitive_and_cycle(spark):
    # transitive triad: 0->1, 1->2, 0->2   (one wedge 0-1-2, closed)
    # plus directed 3-cycle: 3->4, 4->5, 5->3
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (5, 3)])
    res = triad_motifs(e)
    row = res.motifs.collect()[0]
    # wedges: 0->1->2, plus the cycle's three (3->4->5, 4->5->3, 5->3->4)
    assert row.n_paths2 == 4
    assert row.n_transitive == 1
    assert row.n_cyclic == 1
    assert res.n_dropped_mids == 0


def test_triad_motifs_mutual_pair_is_not_a_cycle(spark):
    # 0<->1 only: wedges need u != w, so no paths, no cycles
    e = _edges(spark, [(0, 1), (1, 0)])
    row = triad_motifs(e).motifs.collect()[0]
    assert (row.n_paths2, row.n_transitive, row.n_cyclic) == (0, 0, 0)


def test_triad_motifs_hub_cap_is_loud(spark):
    # star through midpoint 9: in from 0..3, out to 4..7 -> 16 wedges
    pairs = [(i, 9) for i in range(4)] + [(9, j) for j in range(4, 8)]
    e = _edges(spark, pairs)
    full = triad_motifs(e)
    assert full.motifs.collect()[0].n_paths2 == 16
    capped = triad_motifs(e, max_mid_degree=3)
    assert capped.n_dropped_mids == 1
    assert capped.motifs.collect()[0].n_paths2 == 0
