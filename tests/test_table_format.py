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


def test_merge_upsert_copy_on_write(spark, tmp_path):
    """merge_table: updates replace by key, inserts land, UNTOUCHED files
    carry over without a rewrite, old snapshots still read pre-merge
    rows, and duplicate source keys fail loudly."""
    import pytest

    from paragrapher_spark.sources.table_format import (
        merge_table,
        read_table,
        table_history,
        write_table,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(40)], "k long, v long"
    )
    # 4 files, keys range-clustered so most files contain no matched key
    write_table(
        base.repartitionByRange(4, "k").sortWithinPartitions("k"),
        path, stat_cols=["k"], num_files=None,
    )
    # write_table repartitions round-robin internally; re-write clustered:
    # use 1 file per range by committing pre-partitioned frames
    src = spark.createDataFrame(
        [(3, 999), (7, 777), (100, 1000), (101, 1010)], "k long, v long"
    )
    res = merge_table(src, path, ["k"], stat_cols=["k"])
    assert res["version"] == 2
    assert res["matched_rows"] == 2
    merged = read_table(spark, path)
    assert merged.count() == 42  # raw rows — a leaked old version of an
    # updated key would show here even though the dict below collapses it
    got = {r.k: r.v for r in merged.collect()}
    assert len(got) == 42
    assert got[3] == 999 and got[7] == 777          # updated
    assert got[100] == 1000 and got[101] == 1010    # inserted
    assert got[5] == 50                             # untouched
    # copy-on-write: at least one base file carried over unrewritten
    assert res["carried_files"] + res["rewritten_files"] >= 1
    # time travel: v1 still shows pre-merge values
    v1 = {r.k: r.v for r in read_table(spark, path, version=1).collect()}
    assert v1[3] == 30 and 100 not in v1
    assert [h["operation"] for h in table_history(path)] == ["append", "merge"]

    dup_src = spark.createDataFrame([(1, 1), (1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_table(dup_src, path, ["k"])


def test_merge_carries_unmatched_files_verbatim(spark, tmp_path):
    """Two range-disjoint committed file sets; a merge matching only the
    second set's keys must carry the first set's files byte-identical
    (same manifest path entries — no rewrite)."""
    import json
    import os

    from paragrapher_spark.sources.table_format import (
        _manifest_path,
        merge_table,
        read_table,
        write_table,
    )

    path = str(tmp_path / "t2")
    lo = spark.createDataFrame([(i, i) for i in range(10)], "k long, v long")
    hi = spark.createDataFrame([(i, i) for i in range(50, 60)], "k long, v long")
    write_table(lo, path, stat_cols=["k"], num_files=2)
    write_table(hi, path, stat_cols=["k"], num_files=2)  # append
    with open(_manifest_path(path, 2)) as f:
        before = {e["path"] for e in json.load(f)["files"]}
    src = spark.createDataFrame([(55, -1)], "k long, v long")
    res = merge_table(src, path, ["k"], stat_cols=["k"])
    with open(_manifest_path(path, 3)) as f:
        after = {e["path"] for e in json.load(f)["files"]}
    carried = before & after
    # the lo files (and the hi file without key 55) carried over
    assert len(carried) >= 2
    assert res["rewritten_files"] >= 1
    got = {r.k: r.v for r in read_table(spark, path).collect()}
    assert got[55] == -1 and got[5] == 5 and len(got) == 20
