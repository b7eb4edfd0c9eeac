"""Batched PPR (kernels/pagerank.py) and R-MAT generator (sources/edges.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from paragrapher_spark.kernels.pagerank import PPR_FIXED_POINT, ppr_batch
from paragrapher_spark.sources.edges import rmat_edges

S = PPR_FIXED_POINT
T = S - 85 * S // 100  # teleport mass per round


def test_ppr_one_round_hand_values(spark):
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src long, dst long")
    got = {
        (r.seed, r.id): r.ppr_fp
        for r in ppr_batch(e, seeds=[0], rounds=1).collect()
    }
    push = (85 * S) // (100 * 2)  # seed 0 has outdeg 2
    assert got == {(0, 0): T, (0, 1): push, (0, 2): push}


def test_ppr_batch_equals_individual_runs(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 3), (3, 1)], "src long, dst long"
    )
    batch = {
        (r.seed, r.id): r.ppr_fp
        for r in ppr_batch(e, seeds=[0, 2], rounds=4).collect()
    }
    solo = {}
    for s in (0, 2):
        for r in ppr_batch(e, seeds=[s], rounds=4).collect():
            solo[(r.seed, r.id)] = r.ppr_fp
    assert batch == solo  # seeds never mix: batching is purely a plan win


def test_ppr_mass_is_bounded_per_seed(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    res = ppr_batch(e, seeds=[0], rounds=8)
    total = res.agg(F.sum("ppr_fp")).collect()[0][0]
    assert 0 < total <= S  # sub-stochastic: floor + dangling mass only leaks


def test_rmat_is_deterministic_and_in_range(spark):
    a = rmat_edges(spark, scale=8, edge_factor=4)
    b = rmat_edges(spark, scale=8, edge_factor=4)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    stats = a.agg(
        F.min("src"), F.max("src"), F.min("dst"), F.max("dst"), F.count(F.lit(1))
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 256 and stats[2] >= 0 and stats[3] < 256
    assert stats[4] > 0


def test_rmat_degree_distribution_is_skewed(spark):
    g = rmat_edges(spark, scale=8, edge_factor=8)
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    row = deg.agg(F.max("d").alias("mx"), F.avg("d").alias("mean")).collect()[0]
    # the .57 quadrant bias concentrates mass: a power-law hub must exist
    assert row.mx >= 3 * row.mean
