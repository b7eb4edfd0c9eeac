"""Truncated SALSA (kernels/hits.py salsa) vs a hand-computed round."""

from __future__ import annotations

from paragrapher_spark.kernels.hits import SALSA_FIXED_POINT, salsa

S = SALSA_FIXED_POINT


def test_salsa_one_round_hand_values(spark):
    # 0->1, 0->2, 1->2, 2->0 ; indeg: 1:1, 2:2, 0:1 ; outdeg: 0:2, 1:1, 2:1
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {r.id: (r.auth_fp, r.hub_fp) for r in salsa(e, iterations=1).scores.collect()}
    # h(0)=S//1 + S//2 ; h(1)=S//2 ; h(2)=S//1
    # a(1)=h0//2 ; a(2)=h0//2 + h1//1 ; a(0)=h2//1
    h0, h1, h2 = S + S // 2, S // 2, S
    assert got == {
        0: (h2, h0),
        1: (h0 // 2, h1),
        2: (h0 // 2 + h1, h2),
    }


def test_salsa_mass_never_grows(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)], "src long, dst long"
    )
    r1 = salsa(e, iterations=1).scores
    r4 = salsa(e, iterations=4).scores
    m1 = r1.groupBy().sum("auth_fp").collect()[0][0]
    m4 = r4.groupBy().sum("auth_fp").collect()[0][0]
    n = r1.count()
    assert m1 <= n * S
    assert m4 <= m1  # sub-stochastic redistribution: mass is non-increasing


def test_salsa_self_loops_and_duplicates_ignored(spark):
    e = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1), (1, 0)], "src long, dst long"
    )
    got = {r.id: (r.auth_fp, r.hub_fp) for r in salsa(e, iterations=1).scores.collect()}
    # simple graph is 0<->1: indeg=outdeg=1 both; one round is identity mass
    assert got == {0: (S, S), 1: (S, S)}
