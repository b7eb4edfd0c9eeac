"""kernels/matching.py — deterministic maximal matching.

Oracles: sequential greedy over edges sorted by the SAME md5 priority
(the lexicographically-first matching the kernel's fixpoint must equal),
plus matching/maximality invariants and a crash-then-resume run.
"""

from __future__ import annotations

import hashlib

import pytest

from paragrapher_spark.kernels.matching import maximal_matching


def _h(a: int, b: int, seed: int = 42) -> int:
    return int(hashlib.md5(f"match:{seed}:{a}:{b}".encode()).hexdigest()[:15], 16)


def _greedy(pairs):
    """Sequential greedy over canonical edges sorted by (h, a, b)."""
    es = sorted(
        {(min(s, d), max(s, d)) for s, d in pairs if s != d},
        key=lambda e: (_h(*e), *e),
    )
    used, out = set(), set()
    for a, b in es:
        if a not in used and b not in used:
            out.add((a, b))
            used.update((a, b))
    return out


PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 4), (5, 6), (6, 7),
    (7, 5), (1, 3), (8, 9), (3, 0),
]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_matches_sequential_greedy(spark):
    res = maximal_matching(_edges(spark, PAIRS))
    got = {(r["a"], r["b"]) for r in res.matching.collect()}
    assert got == _greedy(PAIRS)


def test_matching_invariants(spark):
    res = maximal_matching(_edges(spark, PAIRS))
    rows = res.matching.collect()
    verts = [v for r in rows for v in (r["a"], r["b"])]
    assert len(verts) == len(set(verts))  # no vertex matched twice
    got = {(r["a"], r["b"]) for r in rows}
    used = set(verts)
    for s, d in PAIRS:  # maximality: every edge touches a matched vertex
        a, b = min(s, d), max(s, d)
        if a != b and (a, b) not in got:
            assert a in used or b in used


def test_first_round_winners_are_local_minima(spark):
    res = maximal_matching(_edges(spark, PAIRS))
    r1 = {(r["a"], r["b"]) for r in res.matching.collect() if r["round"] == 1}
    es = {(min(s, d), max(s, d)) for s, d in PAIRS if s != d}
    for a, b in r1:
        k = (_h(a, b), a, b)
        for x, y in es:
            if {x, y} & {a, b} and (x, y) != (a, b):
                assert (_h(x, y), x, y) > k


def test_k4_plus_isolated_pair(spark):
    # K4's greedy matching is two disjoint edges (pick the min edge, its
    # endpoints leave, one edge remains between the other two vertices)
    # plus the isolated pair = 3 edges, all vertex-disjoint.
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)] + [(10, 11)]
    res = maximal_matching(_edges(spark, pairs))
    got = {(r["a"], r["b"]) for r in res.matching.collect()}
    assert len(got) == 3 and (10, 11) in got
    assert got == _greedy(pairs)


def test_self_loops_and_duplicates_ignored(spark):
    pairs = [(1, 1), (1, 2), (2, 1), (1, 2)]
    res = maximal_matching(_edges(spark, pairs))
    assert {(r["a"], r["b"]) for r in res.matching.collect()} == {(1, 2)}


def test_loud_non_convergence(spark):
    with pytest.raises(RuntimeError, match="max_rounds"):
        maximal_matching(_edges(spark, PAIRS), max_rounds=0)


def test_resume_reproduces_full_run(spark, tmp_path):
    from paragrapher_spark.plans.checkpoint import CheckpointManager

    e = _edges(spark, PAIRS)
    want = sorted(tuple(r) for r in maximal_matching(e).matching.collect())
    cm = CheckpointManager(str(tmp_path), "matching")
    with pytest.raises(RuntimeError):
        maximal_matching(e, max_rounds=1, checkpoint=cm, checkpoint_every=1)
    cm2 = CheckpointManager(str(tmp_path), "matching")
    resumed = maximal_matching(e, checkpoint=cm2, checkpoint_every=1)
    assert resumed.history[0]["round"] == 2  # continued, not restarted
    got = sorted(tuple(r) for r in resumed.matching.collect())
    assert got == want
