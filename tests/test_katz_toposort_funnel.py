"""Tests: Katz centrality, topological levels, funnel analysis.

Oracles are same-program exact replays (the reference's assert style,
`test/test1_deg_dist_WG400.c:230`): Katz against a pure-python integer
recurrence, topo levels against hand-computed longest paths, the funnel
against a per-user python scan.
"""

from __future__ import annotations

import datetime as dt

import pytest

from paragrapher_spark.kernels.katz import eigencentrality, katz
from paragrapher_spark.kernels.toposort import topo_levels
from paragrapher_spark.streaming.events import funnel_stages


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _py_katz(pairs, n_ids, rounds, base, directed):
    """The kernel's integer recurrence, replayed in pure python."""
    adj = {}  # dst -> [srcs]
    es = set()
    for s, d in pairs:
        if s == d:
            continue
        es.add((s, d))
        if not directed:
            es.add((d, s))
    ids = sorted({v for e in es for v in e})
    for s, d in es:
        adj.setdefault(d, []).append(s)
    y = {v: 1 for v in ids}
    for t in range(1, rounds + 1):
        y = {v: base**t + sum(y[u] for u in adj.get(v, [])) for v in ids}
    return y


PAIRS = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (4, 0), (2, 4)]


@pytest.mark.parametrize("directed", [True, False])
def test_katz_matches_integer_replay(spark, directed):
    res = katz(_edges(spark, PAIRS), rounds=4, base=8, directed=directed)
    got = {r["id"]: (r["katz_num"], r["katz_den"], r["katz"]) for r in
           res.scores.collect()}
    want = _py_katz(PAIRS, 5, rounds=4, base=8, directed=directed)
    assert set(got) == set(want)
    for v, y in want.items():
        num, den, x = got[v]
        assert num == y
        assert den == 8**4
        assert x == y / den  # one IEEE division of two exact ints


def test_katz_star_closed_form(spark):
    # directed star leaves -> center: center receives d walks per length
    d = 6
    pairs = [(i, 99) for i in range(d)]
    res = katz(_edges(spark, pairs), rounds=3, base=4, directed=True)
    got = {r["id"]: r["katz_num"] for r in res.scores.collect()}
    # leaf: y_t = 4^t (no in-edges). center: y_t = 4^t + d * 4^(t-1)
    assert got[0] == 4**3
    assert got[99] == 4**3 + d * 4**2


def test_katz_overflow_guard_raises(spark):
    with pytest.raises(ValueError, match="overflow"):
        katz(_edges(spark, PAIRS), rounds=5, base=2**15, directed=True)


def test_katz_history_one_action_per_round(spark):
    res = katz(_edges(spark, PAIRS), rounds=3, base=8)
    assert len(res.history) == 3
    assert all(h["max_y"] > 0 for h in res.history)


def _py_walks(pairs, rounds, directed):
    """eigencentrality's integer recurrence: length-t walk counts."""
    es = set()
    for s, d in pairs:
        if s == d:
            continue
        es.add((s, d))
        if not directed:
            es.add((d, s))
    ids = sorted({v for e in es for v in e})
    adj = {}
    for s, d in es:
        adj.setdefault(d, []).append(s)
    y = {v: 1 for v in ids}
    for _ in range(rounds):
        y = {v: sum(y[u] for u in adj.get(v, [])) for v in ids}
    return y


@pytest.mark.parametrize("directed", [True, False])
def test_eigencentrality_matches_walk_replay(spark, directed):
    res = eigencentrality(_edges(spark, PAIRS), rounds=4, directed=directed)
    got = {r["id"]: (r["walks"], r["eig"]) for r in res.scores.collect()}
    want = _py_walks(PAIRS, rounds=4, directed=directed)
    assert set(got) == set(want)
    mx = max(want.values())
    assert res.max_walks == mx
    for v, y in want.items():
        assert got[v][0] == y
        assert got[v][1] == y / mx  # one IEEE division of exact ints


def test_eigencentrality_star_closed_form(spark):
    # undirected star K_{1,d}: walks alternate center<->leaves;
    # y_0=1; y_1(center)=d, y_1(leaf)=1; y_2(center)=d, y_2(leaf)=d;
    # y_3(center)=d^2, y_3(leaf)=d.
    d = 5
    pairs = [(99, i) for i in range(d)]
    res = eigencentrality(_edges(spark, pairs), rounds=3, directed=False)
    got = {r["id"]: r["walks"] for r in res.scores.collect()}
    assert got[99] == d * d
    assert all(got[i] == d for i in range(d))


def test_eigencentrality_overflow_guard_raises(spark):
    # K2 with huge rounds stays tiny, so force it with a dense-ish graph
    # and absurd round count via a tiny guard proxy: a star grows like
    # d^(t/2) — 40 rounds on d=6 stays under 2^62, so use a clique where
    # y_t ~ (n-1)^t instead.
    pairs = [(i, j) for i in range(8) for j in range(8) if i != j]
    with pytest.raises(ValueError, match="overflow"):
        eigencentrality(_edges(spark, pairs), rounds=40, directed=True)


DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]


def test_topo_levels_diamond(spark):
    res = topo_levels(_edges(spark, DIAMOND))
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    assert res.depth == 3


def test_topo_levels_longest_not_shortest(spark):
    # 0->3 direct AND 0->1->2->3: level(3) must be 3 (longest), not 1
    res = topo_levels(_edges(spark, [(0, 3), (0, 1), (1, 2), (2, 3)]))
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got[3] == 3


def test_topo_levels_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        topo_levels(_edges(spark, [(0, 1), (1, 2), (2, 0)]))


def test_topo_levels_max_rounds_raises(spark):
    chain = [(i, i + 1) for i in range(10)]
    with pytest.raises(ValueError, match="fixpoint"):
        topo_levels(_edges(spark, chain), max_rounds=3)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 0.0, "")
         for i, (u, t, m) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


STEPS = ["signup", "view", "purchase"]


def test_funnel_stages_basic(spark):
    rows = [
        (1, "signup", 0), (1, "view", 5), (1, "purchase", 9),   # stage 3
        (2, "signup", 0), (2, "purchase", 1),                    # stage 1!
        (3, "view", 0), (3, "signup", 1), (3, "view", 2),        # stage 2
        (4, "click", 0),                                         # no funnel
    ]
    got = {r["user_id"]: r for r in
           funnel_stages(_ev(spark, rows), STEPS).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["stage"] == 3
    # user 2 purchased WITHOUT viewing: must stay at stage 1 (ordered funnel)
    assert got[2]["stage"] == 1
    assert got[3]["stage"] == 2
    assert got[1]["t_last_ms"] - got[1]["t_first_ms"] == 9 * 60_000


def test_funnel_strict_time_order(spark):
    # view BEFORE signup does not count; same-timestamp does not advance
    rows = [(1, "view", 0), (1, "signup", 5), (1, "view", 5)]
    got = funnel_stages(_ev(spark, rows), STEPS).collect()
    assert len(got) == 1 and got[0]["stage"] == 1


def test_funnel_python_replay(spark):
    # deterministic pseudo-random event log, replayed in pure python
    rows = []
    for i in range(300):
        u = (i * 7) % 11
        t = ["signup", "view", "purchase", "click"][(i * i) % 4]
        rows.append((u, t, i))
    got = {r["user_id"]: (r["stage"], r["t_first_ms"], r["t_last_ms"])
           for r in funnel_stages(_ev(spark, rows), STEPS).collect()}

    want = {}
    for u in {r[0] for r in rows}:
        mine = sorted((m, t) for (uu, t, m) in rows if uu == u)
        ts = None
        times = []
        for step in STEPS:
            nxt = min(
                (m for m, t in mine
                 if t == step and (ts is None or m > ts)),
                default=None,
            )
            if nxt is None:
                break
            ts = nxt
            times.append(nxt)
        if times:
            want[u] = (len(times), times[0] * 60_000, times[-1] * 60_000)
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    want = {u: (s, base + a, base + b) for u, (s, a, b) in want.items()}
    assert got == want


# ---------------------------------------------------------------------------
# greedy coloring (kernels/coloring.py)
# ---------------------------------------------------------------------------

import hashlib

from paragrapher_spark.kernels.coloring import greedy_coloring


def _py_greedy_coloring(pairs):
    """Sequential greedy in (md5-h, id) order — the kernel's contract."""
    def h(v):
        return int(hashlib.md5(f"color:42:{v}".encode()).hexdigest()[:15], 16)

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    col: dict[int, int] = {}
    for v in sorted(adj, key=lambda v: (h(v), v)):
        used = {col[u] for u in adj[v] if u in col}
        k = 1
        while k in used:
            k += 1
        col[v] = k
    return col, und, adj


COLOR_PAIRS = PAIRS + [(1, 4), (5, 6), (6, 7), (7, 5)]


def test_coloring_matches_sequential_greedy(spark):
    res = greedy_coloring(_edges(spark, COLOR_PAIRS))
    got = {r["id"]: r["color"] for r in res.colors.collect()}
    want, und, adj = _py_greedy_coloring(COLOR_PAIRS)
    assert got == want
    # proper coloring + the greedy bound
    assert all(got[a] != got[b] for a, b in und)
    max_deg = max(len(v) for v in adj.values())
    assert res.n_colors <= max_deg + 1


def test_coloring_k5_needs_five(spark):
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    res = greedy_coloring(_edges(spark, k5))
    got = {r["id"]: r["color"] for r in res.colors.collect()}
    assert sorted(got.values()) == [1, 2, 3, 4, 5]


def test_coloring_max_rounds_raises(spark):
    chain = [(i, i + 1) for i in range(8)]
    with pytest.raises(RuntimeError, match="max_rounds"):
        greedy_coloring(_edges(spark, chain), max_rounds=1)
