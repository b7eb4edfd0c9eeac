"""operators/asof.py — as-of join and bounded range join.

Oracles: pandas ``merge_asof`` (the semantics the operator documents)
and a brute-force O(n^2) pair scan. Determinism of the tie rule and the
bucket-width independence of ``range_join`` are pinned explicitly.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from paragrapher_spark.operators.asof import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _us(minutes: float) -> int:
    return int((T0 + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), 100),
            (1, _ts(30), 101),
            (1, _ts(5), 102),  # before any right row
            (2, _ts(10), 103),  # key with no right rows at all
            (3, _ts(20), 104),  # exact-timestamp match
        ],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 900),
            (1, _ts(9), 901),
            (1, _ts(25), 902),
            (3, _ts(20), 903),
        ],
        "k long, ts timestamp, rid long",
    )
    return left, right


def test_asof_matches_pandas_merge_asof(spark, sides):
    left, right = sides
    got = (
        asof_join(left, right, keys=["k"], right_cols=["rid"])
        .orderBy("lid")
        .collect()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        suffixes=("", "_r")).set_index("lid")
    assert len(got) == left.count()
    for row in got:
        e = exp.loc[row["lid"]]
        if pd.isna(e["rid"]):
            assert row["rid_r"] is None and row["ts_r"] is None
        else:
            assert row["rid_r"] == int(e["rid"])


def test_asof_exact_timestamp_is_eligible(spark, sides):
    left, right = sides
    got = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, keys=["k"], right_cols=["rid"]).collect()}
    assert got[104] == 903  # right row exactly AT left ts matches (<=)


def test_asof_tie_break_is_max_last_right_col(spark):
    # two right rows at the SAME timestamp: the match is the max of the
    # last right_cols column — a documented total order, not task luck.
    left = spark.createDataFrame([(1, _ts(10), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts(5), 7), (1, _ts(5), 9), (1, _ts(5), 8)],
        "k long, ts timestamp, rid long",
    )
    for _ in range(3):
        [row] = asof_join(left, right, keys=["k"], right_cols=["rid"]).collect()
        assert row["rid_r"] == 9


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    got = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, keys=["k"], right_cols=["rid"],
                     tolerance_us=2 * 60 * 1_000_000).collect()}
    # lid=100 at t=10 matched rid=901 at t=9 (gap 1 min, inside tolerance)
    assert got[100] == 901
    # lid=101 at t=30 matched rid=902 at t=25 (gap 5 min) -> nulled
    assert got[101] is None


def test_asof_single_shuffle_plan(spark, sides):
    left, right = sides
    plan = (
        asof_join(left, right, keys=["k"], right_cols=["rid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def _brute_pairs(lrows, rrows, lo, hi):
    out = set()
    for lk, lt, lid in lrows:
        for rk, rt, rid in rrows:
            if lk != rk:
                continue
            gap = int(rt.timestamp() * 1e6) - int(lt.timestamp() * 1e6)
            if lo <= gap <= hi:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("width_us", [None, 60_000_000, 7 * 60_000_000 + 17])
def test_range_join_matches_brute_force_any_width(spark, width_us):
    lrows = [(1, _ts(m), 10 + i) for i, m in enumerate([0, 3, 9, 20])]
    lrows += [(2, _ts(5), 50)]
    rrows = [(1, _ts(m), 90 + i) for i, m in enumerate([1, 4, 10, 40])]
    rrows += [(2, _ts(6), 95), (2, _ts(30), 96)]
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rid long")
    lo, hi = 1, 5 * 60_000_000  # strictly-after, within 5 minutes
    got = {
        (r["lid"], r["rid_r"])
        for r in range_join(left, right, keys=["k"], lower_us=lo,
                            upper_us=hi, width_us=width_us).collect()
    }
    assert got == _brute_pairs(lrows, rrows, lo, hi)


def test_range_join_no_nested_loop_plan(spark):
    left = spark.createDataFrame([(1, _ts(0), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame([(1, _ts(1), 2)], "k long, ts timestamp, rid long")
    plan = range_join(left, right, keys=["k"], lower_us=0, upper_us=60_000_000) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_rejects_empty_range(spark):
    left = spark.createDataFrame([(1, _ts(0), 1)], "k long, ts timestamp, lid long")
    with pytest.raises(ValueError):
        range_join(left, left, keys=["k"], lower_us=5, upper_us=4)
