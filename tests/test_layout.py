"""Z-order layout: exact Morton-value replay, loud range guard, and the
actual pruning property — per-file min/max ranges narrow on BOTH
dimensions in a z-ordered layout, vs one-dimension-only for a plain
sort."""

from __future__ import annotations

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
    z_total = 0
    for lo in (0, 24, 48):
        band = (lo, lo + 7)
        assert files_hit(as_, "b", *band) == 8     # a-sort: b never prunes
        assert files_hit(zs, "b", *band) <= 6      # z-order: b prunes
        assert files_hit(zs, "a", *band) <= 6      # ...and a still prunes
        z_total += files_hit(zs, "b", *band) + files_hit(zs, "a", *band)
    # aggregate claim: across all six band probes, z-order skips well
    # over half the files the a-sort layout cannot (a-sort's total for
    # the same probes is 3*8 b-hits + its perfect a-hits >= 24+3 = 27;
    # z-order must beat that with clear margin even at the jittered
    # boundary worst case)
    assert z_total <= 24
    # a-sort prunes perfectly on a, the dim it sorted by — z-order trades
    # a little of that for pruning on BOTH
    assert files_hit(as_, "a", 24, 31) <= 2
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == 64 * 64


# ---------------------------------------------------------------------------
# degree renumbering + gap-bits compression analytic
# ---------------------------------------------------------------------------


def _gap_bits_py(edges):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
    total = 0
    m = 0
    for s, ds in adj.items():
        prev = None
        for d in sorted(ds):
            if prev is None:
                delta = d - s
                z = 2 * delta if delta >= 0 else -2 * delta - 1
                x = z + 1
            else:
                x = d - prev
            total += 2 * (x.bit_length() - 1) + 1
            m += 1
            prev = d
    return len(adj), m, total


def test_relabel_by_degree_rank_and_consistency(spark):
    from paragrapher_spark.operators.layout import relabel_by_degree, relabel_edges

    edges = [(10, 20), (10, 30), (10, 40), (20, 30), (50, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    mapping = {r.old_id: (r.degree, r.new_id) for r in relabel_by_degree(df).collect()}
    # python replay: total endpoint occurrences, rank by (-deg, id)
    from collections import Counter

    cnt = Counter([v for e in edges for v in e])
    order = sorted(cnt, key=lambda v: (-cnt[v], v))
    assert mapping == {v: (cnt[v], i) for i, v in enumerate(order)}
    assert mapping[10][1] == 0  # highest degree -> id 0
    rel = sorted(
        (r.src, r.dst)
        for r in relabel_edges(df, relabel_by_degree(df)).collect()
    )
    want = sorted((mapping[s][1], mapping[d][1]) for s, d in edges)
    assert rel == want


def test_adjacency_gap_bits_exact(spark):
    from paragrapher_spark.fixtures import powerlaw_graph
    from paragrapher_spark.operators.layout import (
        adjacency_gap_bits,
        relabel_by_degree,
        relabel_edges,
    )

    # hand-checked fixture: 0 -> {1, 3, 10}: first gamma(zigzag(1)+1=3)=3,
    # then gamma(2)=3, gamma(7)=5; 5 -> {2}: delta=-3, zig=5, gamma(6)=5
    df = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 10), (5, 2)], "src long, dst long"
    )
    row = adjacency_gap_bits(df).collect()[0]
    assert (row.n_lists, row.n_edges, row.total_bits) == (2, 4, 16)
    assert row.bits_per_edge_fp == 16_000 // 4

    pl = powerlaw_graph(spark, n=300, seed=7)
    edges = [(r.src, r.dst) for r in pl.collect()]
    got = adjacency_gap_bits(pl).collect()[0]
    assert (got.n_lists, got.n_edges, got.total_bits) == _gap_bits_py(edges)

    relabeled = relabel_edges(pl, relabel_by_degree(pl))
    redges = [(r.src, r.dst) for r in relabeled.collect()]
    got2 = adjacency_gap_bits(relabeled, "degree").collect()[0]
    assert (got2.n_lists, got2.n_edges, got2.total_bits) == _gap_bits_py(redges)
    assert got2.ordering == "degree"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key/count: the equi-join plans
    with ZERO Exchange below it (the pay-the-shuffle-once contract);
    the same join on plain parquet shows 2. With sortBy, no per-query
    Sort either. Values identical either way."""
    from paragrapher_spark.operators.layout import read_bucketed, write_bucketed

    facts = spark.createDataFrame(
        [(i % 50, i, i * 3) for i in range(4000)], "k long, a long, b long"
    )
    dims = spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], "k long, name string"
    )
    write_bucketed(facts, "t_facts_b", ["k"], 8, str(tmp_path / "fb"), sort_cols=["k"])
    write_bucketed(dims, "t_dims_b", ["k"], 8, str(tmp_path / "db"), sort_cols=["k"])
    facts.write.mode("overwrite").parquet(str(tmp_path / "fp"))
    dims.write.mode("overwrite").parquet(str(tmp_path / "dp"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jb = read_bucketed(spark, "t_facts_b").join(
            read_bucketed(spark, "t_dims_b"), on="k"
        )
        plan_b = jb._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan_b
        assert "SortMergeJoin" in plan_b

        jp = spark.read.parquet(str(tmp_path / "fp")).join(
            spark.read.parquet(str(tmp_path / "dp")), on="k"
        )
        plan_p = jp._jdf.queryExecution().executedPlan().toString()
        assert plan_p.count("Exchange") >= 2

        got_b = sorted((r.k, r.a, r.b, r.name) for r in jb.collect())
        got_p = sorted((r.k, r.a, r.b, r.name) for r in jp.collect())
        assert got_b == got_p and len(got_b) == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_bucketed_agg_uses_bucket_layout(spark, tmp_path):
    """A groupBy on the bucket key aggregates without a shuffle —
    bucketing serves aggregation co-location too, not just joins."""
    from paragrapher_spark.operators.layout import read_bucketed, write_bucketed

    df = spark.createDataFrame(
        [(i % 20, i) for i in range(2000)], "k long, v long"
    )
    write_bucketed(df, "t_agg_b", ["k"], 4, str(tmp_path / "ab"))
    try:
        agg = read_bucketed(spark, "t_agg_b").groupBy("k").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert {(r.k, r["count"]) for r in agg.collect()} == {
            (k, 100) for k in range(20)
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_b")
