"""dense_ids / prefix_sum — scale-safe substitutes for global windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from paragrapher_spark.operators.indexing import dense_ids, prefix_sum


def test_dense_ids_rank_order(spark):
    df = spark.createDataFrame(
        [(f"k{i:04d}",) for i in range(0, 500, 2)], "key string"
    )
    out = dense_ids(df, ["key"], num_partitions=7).orderBy("key").collect()
    assert [r.id for r in out] == list(range(250))
    assert out[0].key == "k0000" and out[-1].key == "k0498"


def test_dense_ids_deduplicates(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",), ("c",), ("b",)], "key string")
    out = dense_ids(df, ["key"], num_partitions=3).orderBy("key").collect()
    assert [(r.key, r.id) for r in out] == [("a", 0), ("b", 1), ("c", 2)]


def test_prefix_sum_matches_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, (i * 7919) % 13) for i in range(1000)], "id long, v long"
    )
    got = prefix_sum(df, ["id"], "v", out_col="offset", num_partitions=9)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select("id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("offset"))
    diff = (
        got.select("id", "offset")
        .exceptAll(want.select("id", "offset"))
        .count()
    )
    assert diff == 0
    # CSR invariant: last offset + last value == total (WG400AP.java:255)
    total = df.agg(F.sum("v")).collect()[0][0]
    last = got.orderBy(F.col("id").desc()).limit(1).collect()[0]
    last_v = df.where(F.col("id") == last.id).collect()[0].v
    assert last.offset + last_v == total


def test_prefix_sum_inclusive(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "id long, v long")
    got = prefix_sum(df, ["id"], "v", out_col="c", exclusive=False, num_partitions=4)
    rows = got.orderBy("id").collect()
    assert [r.c for r in rows] == list(range(1, 101))
