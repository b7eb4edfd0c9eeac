"""Z-order layout: exact Morton-value replay, loud range guard, and the
actual pruning property — per-file min/max ranges narrow on BOTH
dimensions in a z-ordered layout, vs one-dimension-only for a plain
sort."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from paragrapher_spark.operators.layout import (
    write_zordered,
    zvalue,
    zvalue_sql,
)


def _z_py(x: int, y: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_and_sql(spark):
    import duckdb

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (1000, 7), (2**20, 2**20 - 1)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got == {(x, y): _z_py(x, y) for x, y in pairs}
    expr = zvalue_sql("x", "y")
    sql_got = {
        (x, y): z
        for x, y, z in duckdb.sql(
            "SELECT x, y, " + expr + " AS z FROM (VALUES "
            + ", ".join(f"({x}, {y})" for x, y in pairs)
            + ") t(x, y)"
        ).fetchall()
    }
    assert sql_got == got


def test_zvalue_locality(spark):
    # the point of Morton order: close in z => close in both dims
    # (quadrant property: the top bit pair splits the plane into 4 tiles)
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = df.select("x", "y", zvalue(F.col("x"), F.col("y"), 4).alias("z")).collect()
    for r in rows:
        quad = r.z >> 6
        assert quad == ((r.y >> 3) << 1 | (r.x >> 3))


def test_zvalue_range_guard_is_loud(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1 << 21, 0)], "x long, y long")
    with pytest.raises(SparkRuntimeException, match="zvalue"):
        df.select(zvalue(F.col("x"), F.col("y"))).collect()


def test_zordered_write_prunes_both_dims(spark, tmp_path):
    # 64x64 grid of (a, b) keys, 8 files. The pruning metric a reader
    # actually experiences: how many files' min/max stats OVERLAP a band
    # predicate (those are the files parquet cannot skip). Plain a-sort:
    # every file spans b fully, so a b-band hits all 8. Z-order: both
    # dims cluster (up to sampled-range-boundary noise — a file crossing
    # a high Morton bit can span wide, so the bound is "most files
    # skip", not a hard per-file span).
    df = spark.createDataFrame(
        [(a, b) for a in range(64) for b in range(64)], "a long, b long"
    )
    zpath = str(tmp_path / "zord")
    apath = str(tmp_path / "asort")
    write_zordered(df, zpath, ("a", "b"), bits=6, n_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(apath)
    )

    def file_stats(path):
        per = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("a").alias("la"), F.max("a").alias("ha"),
                F.min("b").alias("lb"), F.max("b").alias("hb"),
            )
            .collect()
        )
        assert len(per) == 8
        return per

    def files_hit(stats, dim, lo, hi):
        lo_c, hi_c = ("la", "ha") if dim == "a" else ("lb", "hb")
        return sum(1 for r in stats if r[lo_c] <= hi and r[hi_c] >= lo)

    zs = file_stats(zpath)
    as_ = file_stats(apath)
    for lo in (0, 24, 48):
        band = (lo, lo + 7)
        assert files_hit(as_, "b", *band) == 8     # a-sort: b never prunes
        assert files_hit(zs, "b", *band) <= 5      # z-order: b prunes
        assert files_hit(zs, "a", *band) <= 5      # ...and a still prunes
    # a-sort prunes perfectly on a, the dim it sorted by — z-order trades
    # a little of that for pruning on BOTH
    assert files_hit(as_, "a", 24, 31) <= 2
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == 64 * 64
