"""functions/stats.py — exact grouped quantiles vs numpy method="lower"."""

from __future__ import annotations

import numpy as np
import pytest

from paragrapher_spark.functions.stats import group_quantiles


@pytest.fixture(scope="module")
def grouped(spark):
    rng = np.random.RandomState(7)
    rows = []
    for g, n in [("a", 101), ("b", 10), ("c", 1)]:
        for v in rng.randint(0, 50, size=n):  # heavy ties on purpose
            rows.append((g, int(v)))
    return spark.createDataFrame(rows, "g string, v long")


def test_matches_numpy_lower(spark, grouped):
    got = {r["g"]: r for r in group_quantiles(grouped, ["g"], "v").collect()}
    pdf = grouped.toPandas()
    for g, sub in pdf.groupby("g"):
        vals = np.sort(sub["v"].values)
        row = got[g]
        assert row["n"] == len(vals)
        assert row["v_min"] == vals[0] and row["v_max"] == vals[-1]
        for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert row[col] == np.quantile(vals, q, method="lower"), (g, col)


def test_boundary_quantiles_are_min_and_max(spark, grouped):
    got = group_quantiles(grouped, ["g"], "v", qs=("0", "1")).collect()
    for row in got:
        assert row["p0"] == row["v_min"]
        assert row["p100"] == row["v_max"]


def test_single_row_group(spark):
    df = spark.createDataFrame([("x", 42)], "g string, v long")
    [row] = group_quantiles(df, ["g"], "v").collect()
    assert (row["n"], row["p50"], row["p90"], row["p99"]) == (1, 42, 42, 42)


def test_rejects_out_of_range(spark, grouped):
    with pytest.raises(ValueError):
        group_quantiles(grouped, ["g"], "v", qs=("1.5",))
