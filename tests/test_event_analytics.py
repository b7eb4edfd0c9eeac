"""Batch event analytics: cohort retention, Markov transitions, bursts.

Python-side oracles are independent re-implementations over tiny
hand-built event logs (the repo's test standard: every aggregate column
checked exactly, not just row counts).
"""

from __future__ import annotations

import datetime as dt

from paragrapher_spark.streaming.events import (
    cohort_retention,
    event_bursts,
    event_transitions,
)


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type)"""
    return spark.createDataFrame(
        [
            (eid, dt.datetime.fromisoformat(ts), uid, et, 0.0, "{}")
            for eid, ts, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_cohort_retention_exact(spark):
    # user 1 first seen week of Mon 2024-01-01; active again 2 weeks later.
    # user 2 first seen the same week, never returns.
    # user 3 first seen the following week.
    ev = _events(
        spark,
        [
            (1, "2024-01-02T10:00:00", 1, "view"),
            (2, "2024-01-16T10:00:00", 1, "view"),
            (3, "2024-01-17T10:00:00", 1, "click"),  # same (cohort,offset) cell
            (4, "2024-01-03T10:00:00", 2, "view"),
            (5, "2024-01-09T10:00:00", 3, "view"),
        ],
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    # week index of Mon 2024-01-01: (19723 - 4) // 7 = 2817
    w0 = (dt.date(2024, 1, 2) - dt.date(1970, 1, 1)).days
    wk0 = (w0 - 1 - 4) // 7  # Monday of that week
    assert got == {
        (wk0, 0): 2,  # users 1 and 2 active in their cohort week
        (wk0, 2): 1,  # user 1 back two weeks later (both its events collapse)
        (wk0 + 1, 0): 1,  # user 3's own cohort
    }


def test_event_transitions_counts_and_fixed_point(spark):
    # user 1: view -> click -> view ; user 2: view -> view
    # transitions: view->click 1, click->view 1, view->view 1
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:00:00", 1, "view"),
            (2, "2024-01-01T00:01:00", 1, "click"),
            (3, "2024-01-01T00:02:00", 1, "view"),
            (4, "2024-01-01T00:00:00", 2, "view"),
            (5, "2024-01-01T00:00:30", 2, "view"),
        ],
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.n_from, r.p_fp)
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("view", "click"): (1, 2, 500000),
        ("view", "view"): (1, 2, 500000),
        ("click", "view"): (1, 1, 1000000),
    }


def test_event_transitions_timestamp_tie_broken_by_event_id(spark):
    # two same-timestamp events: order must follow event_id
    ev = _events(
        spark,
        [
            (10, "2024-01-01T00:00:00", 1, "a"),
            (11, "2024-01-01T00:00:00", 1, "b"),
            (12, "2024-01-01T00:00:01", 1, "c"),
        ],
    )
    got = {(r.from_type, r.to_type) for r in event_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_event_bursts_median_rule(spark):
    # user 1 daily counts: day0=1, day1=1, day2=1, day3=5 -> median (type-1,
    # rank ceil(4/2)=2 in (count, day) order) = 1; burst iff count > 3*1.
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 1), (2, 1), (3, 5)]:
        for i in range(n):
            eid += 1
            rows.append(
                (eid, f"2024-02-0{day + 1}T0{i}:00:00", 1, "view")
            )
    ev = _events(spark, rows)
    got = [(r.day_idx, r.n_events, r.median_n) for r in event_bursts(ev).collect()]
    d3 = (dt.date(2024, 2, 4) - dt.date(1970, 1, 1)).days
    assert got == [(d3, 5, 1)]


def test_event_bursts_factor_boundary_is_strict(spark):
    # counts 1,1,3: median=1, 3 == 3*1 is NOT a burst (strict >)
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 1), (2, 3)]:
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-03-0{day + 1}T0{i}:00:00", 7, "view"))
    ev = _events(spark, rows)
    assert event_bursts(ev).count() == 0
