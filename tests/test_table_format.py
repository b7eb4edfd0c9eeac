"""Snapshot table format: atomic versioned commits, time travel,
manifest-level file pruning, optimistic-concurrency conflict."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from paragrapher_spark.sources.table_format import (
    CommitConflict,
    read_table,
    table_history,
    write_table,
)


def test_append_time_travel_and_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    a = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "id long, t string")
    b = spark.createDataFrame([(i, f"d{i}") for i in range(10, 25)], "id long, t string")
    v1 = write_table(a, path, mode="append", stat_cols=["id"], num_files=2)
    v2 = write_table(b, path, mode="append", stat_cols=["id"], num_files=2)
    assert (v1, v2) == (1, 2)
    assert read_table(spark, path).count() == 25            # current
    assert read_table(spark, path, version=1).count() == 10  # time travel
    assert sorted(r.id for r in read_table(spark, path, version=1).collect()) == list(range(10))
    hist = table_history(path)
    assert [(h["version"], h["n_rows"]) for h in hist] == [(1, 10), (2, 25)]

    # overwrite starts fresh but v2 stays readable
    c = spark.createDataFrame([(99, "x")], "id long, t string")
    v3 = write_table(c, path, mode="overwrite", stat_cols=["id"], num_files=1)
    assert v3 == 3
    assert read_table(spark, path).count() == 1
    assert read_table(spark, path, version=2).count() == 25


def test_manifest_pruning_skips_files(spark, tmp_path):
    path = str(tmp_path / "tblp")
    # two disjoint id ranges in separate commits -> separate files
    lo = spark.createDataFrame([(i,) for i in range(100)], "id long")
    hi = spark.createDataFrame([(i,) for i in range(1000, 1100)], "id long")
    write_table(lo, path, stat_cols=["id"], num_files=1)
    write_table(hi, path, stat_cols=["id"], num_files=1)
    pruned = read_table(spark, path, filters=[("id", 1000, 1050)])
    # only the hi file survives the manifest prune
    assert pruned.count() == 100
    n_files = pruned.select(F.input_file_name()).distinct().count()
    assert n_files == 1
    # empty prune keeps the schema
    empty = read_table(spark, path, filters=[("id", 5000, 6000)])
    assert empty.count() == 0 and empty.columns == ["id"]
    # filtering on a column without stats is loud
    with pytest.raises(ValueError, match="no manifest stats"):
        read_table(spark, path, filters=[("t", 0, 1)])


def test_commit_conflict_is_loud(spark, tmp_path):
    from paragrapher_spark.sources.table_format import _swap_pointer

    path = str(tmp_path / "tblc")
    df = spark.createDataFrame([(1,)], "id long")
    write_table(df, path, num_files=1)
    with pytest.raises(CommitConflict):
        _swap_pointer(path, expect=0, new=9)  # stale base version
    # version guard: reading a never-written snapshot is loud
    with pytest.raises(ValueError, match="no snapshot"):
        read_table(spark, path, version=7)


def test_expire_snapshots_gc(spark, tmp_path):
    from paragrapher_spark.sources.table_format import expire_snapshots

    path = str(tmp_path / "tble")
    a = spark.createDataFrame([(i,) for i in range(5)], "id long")
    b = spark.createDataFrame([(i,) for i in range(5, 9)], "id long")
    write_table(a, path, num_files=1)                      # v1
    write_table(b, path, mode="append", num_files=1)       # v2 (reuses v1 files)
    write_table(b, path, mode="overwrite", num_files=1)    # v3 (fresh set)
    res = expire_snapshots(path, keep_last=1)
    assert res["expired_versions"] == [1, 2]
    # v1/v2's files are gone (v3 doesn't reference them), v3 intact
    assert read_table(spark, path).count() == 4
    with pytest.raises(ValueError, match="no snapshot"):
        read_table(spark, path, version=1)
    # shared-file safety: append-only chains share files with the kept
    # snapshot, so expiry must delete manifests but NOT shared data
    path2 = str(tmp_path / "tble2")
    write_table(a, path2, num_files=1)                     # v1
    write_table(b, path2, mode="append", num_files=1)      # v2 shares v1 files
    res2 = expire_snapshots(path2, keep_last=1)
    assert res2["expired_versions"] == [1]
    assert res2["deleted_files"] == 0                      # all shared
    assert read_table(spark, path2).count() == 9


def test_engine_open_graph_snapshot_kind(spark, tmp_path):
    """Engine facade over the snapshot table: open_graph(kind='snapshot')
    extracts the import graph from the CURRENT version, and ':vN' time
    travel opens exactly the old corpus."""
    from paragrapher_spark.engine import Engine
    from paragrapher_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, n_files=200, n_repos=4)
    path = str(tmp_path / "corpus_snap")
    half = corpus.where(F.col("path") < "pkg2")
    write_table(half, path, num_files=2)                       # v1
    write_table(corpus.subtract(half), path, num_files=2)      # v2 = full
    eng = Engine(spark)
    g_old = eng.open_graph(f"{path}:v1", kind="snapshot")
    g_cur = eng.open_graph(path, kind="snapshot")
    from paragrapher_spark.graph import edges_from_corpus

    want_old = edges_from_corpus(half)
    want_cur = edges_from_corpus(corpus)
    assert sorted(map(tuple, g_old.edges.select("src", "dst").collect())) == \
        sorted(map(tuple, want_old.edges.select("src", "dst").collect()))
    assert sorted(map(tuple, g_cur.edges.select("src", "dst").collect())) == \
        sorted(map(tuple, want_cur.edges.select("src", "dst").collect()))
    assert g_cur.num_edges >= g_old.num_edges


def test_compact_table(spark, tmp_path):
    from paragrapher_spark.sources.table_format import compact_table

    path = str(tmp_path / "tblcmp")
    for lo in range(0, 40, 10):  # 4 appends x 2 files = 8 small files
        df = spark.createDataFrame([(i,) for i in range(lo, lo + 10)], "id long")
        write_table(df, path, stat_cols=["id"], num_files=2)
    assert table_history(path)[-1]["n_files"] == 8
    v = compact_table(spark, path, target_files=2, stat_cols=["id"])
    hist = table_history(path)
    assert hist[-1] == {"version": v, "operation": "compact", "n_files": 2,
                        "n_rows": 40}
    assert sorted(r.id for r in read_table(spark, path).collect()) == list(range(40))
    # pre-compaction snapshot still readable (time travel)
    assert read_table(spark, path, version=v - 1).count() == 40
