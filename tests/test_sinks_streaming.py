"""Converter sinks (reference test3..test6 workloads) + streaming events."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from paragrapher_spark.graph import edges_from_corpus, graph_from_edges
from paragrapher_spark.fixtures import small5x14
from paragrapher_spark.sources.corpus import synth_corpus
from paragrapher_spark.sources.sinks import (
    edge_checksum,
    narrow_ids,
    read_adjacency_text,
    read_csr,
    read_edge_text,
    read_matrix_market,
    scan_edges,
    write_adjacency_text,
    write_csr,
    write_edge_text,
    write_matrix_market,
)
from paragrapher_spark.streaming.events import (
    stream_events_hourly,
    windowed_event_counts,
)


def test_csr_roundtrip_and_scan(spark, tmp_path):
    g = edges_from_corpus(synth_corpus(spark, 200, 4), num_partitions=4)
    path = str(tmp_path / "graph")
    write_csr(g, path, num_partitions=4)
    back = read_csr(spark, path)
    assert back.num_vertices == g.num_vertices
    assert back.num_edges == g.num_edges
    # every edge delivered exactly once (reference invariant test1:230)
    assert edge_checksum(back.edges) == edge_checksum(g.edges)
    # range scan == filter on the original (subgraph semantics,
    # paragrapher_csx_get_subgraph)
    sub = scan_edges(spark, path, 50, 100)
    want = g.edges.where((F.col("src") >= 50) & (F.col("src") < 100))
    assert sub.count() == want.count()
    assert edge_checksum(sub) == edge_checksum(want)
    # filter must reach the parquet scan (pushdown)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(src,50" in plan


def test_edge_text_writer(spark, tmp_path):
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "el")
    write_edge_text(g.edges, path, single_file=True)
    lines = sorted(
        tuple(map(int, r.value.split())) for r in spark.read.text(path).collect()
    )
    want = sorted((r.src, r.dst) for r in g.edges.collect())
    assert lines == want


def _concat_text_parts(path: str) -> list[str]:
    """Concatenate part files in name order — the writer's contract is
    that this concatenation IS the sequential file."""
    import glob

    lines: list[str] = []
    for p in sorted(glob.glob(f"{path}/part-*")):
        with open(p) as fh:
            lines += fh.read().splitlines()
    return lines


def test_adjacency_text_writer(spark, tmp_path):
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "g.adj")
    write_adjacency_text(g, path, num_partitions=3)
    lines = _concat_text_parts(path)
    assert lines[0] == "AdjacencyGraph"
    assert int(lines[1]) == g.num_vertices == 5
    assert int(lines[2]) == g.num_edges == 14
    offsets = [int(x) for x in lines[3 : 3 + 5]]
    dests = [int(x) for x in lines[8 : 8 + 14]]
    assert offsets[0] == 0 and len(dests) == 14
    # offsets prefix-sum invariant (WG400AP.java:255)
    degs = {r.id: r.out_degree for r in g.out_degrees().collect()}
    assert offsets[-1] + degs[4] == 14
    # destinations are (src, dst)-sorted per the CSR layout
    want_dests = [d for _, d in sorted((r.src, r.dst) for r in g.edges.collect())]
    assert dests == want_dests


def test_adjacency_text_roundtrip(spark, tmp_path):
    # write with Spark, read back with Spark, identical graph
    # (test3's consumable-output contract, test3:289-312)
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "rt.adj")
    write_adjacency_text(g, path, num_partitions=3)
    back = read_adjacency_text(spark, path)
    assert back.num_vertices == 5 and back.num_edges == 14
    assert edge_checksum(back.edges) == edge_checksum(g.edges)
    assert sorted((r.src, r.dst) for r in back.edges.collect()) == sorted(
        (r.src, r.dst) for r in g.edges.collect()
    )


def test_edge_text_roundtrip(spark, tmp_path):
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "rt.el")
    write_edge_text(g.edges, path)
    back = read_edge_text(spark, path)
    assert edge_checksum(back) == edge_checksum(g.edges)
    assert back.count() == 14


def test_narrow_ids(spark):
    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    out = narrow_ids(e)
    assert [f.dataType.simpleString() for f in out.schema.fields][:2] == ["int", "int"]
    big = spark.createDataFrame([(1, 1 << 40)], "src long, dst long")
    try:
        narrow_ids(big)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_windowed_events_batch_vs_stream(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src_dir = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src_dir)

    batch = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(spark.read.parquet(src_dir)).collect()
    }
    q = stream_events_hourly(
        spark, src_dir, str(tmp_path / "ckpt"), query_name="ev_test"
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM ev_test").collect()
    }
    assert got == batch and len(got) > 0


def test_sessionize_batch_gaps(spark):
    from paragrapher_spark.streaming.events import sessionize_batch

    rows = [
        # user 1: two sessions (gap > 30min between e2 and e3)
        (1, "2026-01-01 10:00:00", 1, "c", 1.0, ""),
        (2, "2026-01-01 10:10:00", 1, "c", 2.0, ""),
        (3, "2026-01-01 11:00:00", 1, "c", 3.0, ""),
        # user 2: one session
        (4, "2026-01-01 09:00:00", 2, "c", 5.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    )
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    assert got[(1, "2026-01-01 10:00:00")] == (2, 3.0)
    assert got[(1, "2026-01-01 11:00:00")] == (1, 3.0)
    assert got[(2, "2026-01-01 09:00:00")] == (1, 5.0)


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    """applyInPandasWithState sessionizer: with a single availableNow batch,
    every session except each user's trailing (still-open) one is emitted,
    and they equal the batch gaps-and-islands result minus those trailing
    sessions."""
    from paragrapher_spark.sources.edges import load_table
    from paragrapher_spark.streaming.events import sessionize_batch, sessionize_stream

    src_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    events = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("user_id") < 40
    )
    events.write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_minutes=120)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }
    batch = sessionize_batch(spark.read.parquet(src_dir), gap_minutes=120).collect()
    # drop each user's last session (open in the stream's state)
    last_start = {}
    for r in batch:
        k = str(r.session_start)
        if r.user_id not in last_start or k > last_start[r.user_id]:
            last_start[r.user_id] = k
    want = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events, round(r.sum_value, 6))
        for r in batch
        if str(r.session_start) != last_start[r.user_id]
    }
    assert got == want
    assert len(want) > 0  # the fixture actually exercises multi-session users


def test_weighted_edge_text_roundtrip(spark, tmp_path):
    # .wel shape — the textual twin of test6's weighted binary pairs
    e = spark.createDataFrame(
        [(0, 1, 2.5), (0, 2, 1.0), (1, 2, 7.25)], "src long, dst long, weight double"
    )
    path = str(tmp_path / "rt.wel")
    write_edge_text(e, path, single_file=True, weight_col="weight")
    back = read_edge_text(spark, path, weighted=True)
    got = sorted((r.src, r.dst, r.weight) for r in back.collect())
    assert got == [(0, 1, 2.5), (0, 2, 1.0), (1, 2, 7.25)]


def test_adjacency_single_file_mode(spark, tmp_path):
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "one.adj")
    write_adjacency_text(g, path, num_partitions=3, single_file=True)
    import os

    assert os.path.isfile(path)  # a plain file, not a part directory
    lines = open(path).read().splitlines()
    assert lines[0] == "AdjacencyGraph" and int(lines[1]) == 5
    back = read_adjacency_text(spark, path)
    assert edge_checksum(back.edges) == edge_checksum(g.edges)


def test_adjacency_rejects_sparse_ids(spark):
    e = spark.createDataFrame([(5, 9)], "src long, dst long")
    g = graph_from_edges(e)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dense vertex ids"):
        write_adjacency_text(g, "/tmp/should_not_exist.adj")


def test_read_edge_text_rejects_malformed(spark, tmp_path):
    import pytest as _pytest

    p = tmp_path / "bad.el"
    p.write_text("0 1\n2 notanumber\n")
    # ANSI mode already fails the cast loudly; the assert_true guard covers
    # the null-producing shapes (missing columns) below
    with _pytest.raises(Exception, match="CAST_INVALID_INPUT|malformed edge line"):
        read_edge_text(spark, str(p)).collect()
    # weighted read of a 2-column file must fail, not yield null weights
    p2 = tmp_path / "two.el"
    p2.write_text("0 1\n1 2\n")
    with _pytest.raises(Exception, match="INVALID_ARRAY_INDEX|malformed"):
        read_edge_text(spark, str(p2), weighted=True).collect()


def test_read_adjacency_text_rejects_interior_blank_shift(spark, tmp_path):
    """An interior blank line leaves the non-blank body count at n + m
    (so a count-only check passes) while shifting every later row one
    positional slot — sections misalign and edges land on wrong
    vertices. The reader must reject it (ADVICE: sinks.py loud-
    malformed-input contract)."""
    import pytest as _pytest

    from paragrapher_spark.sources.sinks import read_adjacency_text

    good = "AdjacencyGraph\n3\n4\n0\n2\n3\n1\n2\n0\n0\n"
    p = tmp_path / "good.adj"
    p.write_text(good)
    g = read_adjacency_text(spark, str(p))
    assert g.num_vertices == 3 and g.num_edges == 4

    # same content with a blank line between offsets: count unchanged,
    # positions shifted
    bad = "AdjacencyGraph\n3\n4\n0\n\n2\n3\n1\n2\n0\n0\n"
    p2 = tmp_path / "bad.adj"
    p2.write_text(bad)
    with _pytest.raises(ValueError, match="malformed AdjacencyGraph"):
        read_adjacency_text(spark, str(p2))

    # truncated body still rejected
    p3 = tmp_path / "trunc.adj"
    p3.write_text("AdjacencyGraph\n3\n4\n0\n2\n3\n1\n2\n")
    with _pytest.raises(ValueError, match="malformed AdjacencyGraph"):
        read_adjacency_text(spark, str(p3))


def test_matrix_market_roundtrip_general(spark, tmp_path):
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "g.mtx")
    write_matrix_market(g, path, weight_col="weight", single_file=True)
    import os

    lines = open(path).read().splitlines()
    assert lines[0] == "%%MatrixMarket matrix coordinate integer general"
    assert lines[1] == "5 5 14"
    assert os.path.isfile(path)
    back = read_matrix_market(spark, path)
    assert back.num_vertices == 5 and back.num_edges == 14
    assert edge_checksum(back.edges) == edge_checksum(g.edges)
    got = {(r.src, r.dst): r.weight for r in back.edges.collect()}
    want = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    assert got == want


def test_matrix_market_roundtrip_pattern_dir(spark, tmp_path):
    # pattern field (MM_400: no weights), multi-part directory output
    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "pat.mtx")
    write_matrix_market(g, path, num_partitions=3)
    back = read_matrix_market(spark, path)
    assert edge_checksum(back.edges) == edge_checksum(g.edges)
    assert back.edges.where(F.col("weight") != 1).count() == 0


def test_matrix_market_symmetric_mirrors(spark, tmp_path):
    # undirected triangle + a self-loop: symmetric storage keeps one
    # triangular entry per edge; the reader mirrors off-diagonals only
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 2)], "src long, dst long"
    )
    g = graph_from_edges(e)
    path = str(tmp_path / "sym.mtx")
    write_matrix_market(g, path, symmetric=True, single_file=True)
    lines = open(path).read().splitlines()
    assert lines[0].endswith("pattern symmetric")
    # stored lower-triangle (row >= col), 1-based
    assert sorted(lines[2:]) == ["2 1", "3 1", "3 2", "3 3"]
    back = read_matrix_market(spark, path)
    got = sorted((r.src, r.dst) for r in back.edges.collect())
    assert got == [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
    assert back.num_edges == 7


def test_matrix_market_rejects_malformed(spark, tmp_path):
    import pytest as _pytest

    bad_banner = tmp_path / "b.mtx"
    bad_banner.write_text("not a banner\n1 1 0\n")
    with _pytest.raises(ValueError, match="not a MatrixMarket"):
        read_matrix_market(spark, str(bad_banner))

    rect = tmp_path / "r.mtx"
    rect.write_text("%%MatrixMarket matrix coordinate pattern general\n2 3 1\n1 2\n")
    with _pytest.raises(ValueError, match="square"):
        read_matrix_market(spark, str(rect))

    truncated = tmp_path / "t.mtx"
    truncated.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n3 3 5\n1 2\n2 3\n"
    )
    with _pytest.raises(ValueError, match="nnz=5"):
        read_matrix_market(spark, str(truncated))

    oob = tmp_path / "o.mtx"
    oob.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n3 3 1\n1 9\n"
    )
    with _pytest.raises(Exception, match="out of range"):
        read_matrix_market(spark, str(oob)).edges.collect()


def test_open_graph_mtx_kind(spark, tmp_path):
    from paragrapher_spark.engine import Engine

    g = graph_from_edges(small5x14(spark))
    path = str(tmp_path / "eng.mtx")
    write_matrix_market(g, path, weight_col="weight", single_file=True)
    eng = Engine(spark)
    back = eng.open_graph(path, kind="mtx")
    assert back.num_vertices == 5 and back.num_edges == 14
    eng.release_graph(back)


def test_matrix_market_symmetric_rejects_both_directions(spark, tmp_path):
    import pytest as _pytest

    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    g = graph_from_edges(e)
    with _pytest.raises(ValueError, match="canonical undirected"):
        write_matrix_market(g, str(tmp_path / "dup.mtx"), symmetric=True)


# ---------------------------------------------------------------------------
# streaming edge ingestion -> incremental degrees
# ---------------------------------------------------------------------------


def test_stream_degrees_matches_batch_and_resumes(spark, tmp_path):
    from paragrapher_spark.sources.edges import md5_vertex_graph
    from paragrapher_spark.streaming.graph_stream import (
        incremental_degrees,
        stream_degrees,
    )

    src_dir = str(tmp_path / "blocks")
    ck_dir = str(tmp_path / "ck")
    g = md5_vertex_graph(spark, 60, out_deg=3).withColumn(
        "part", F.pmod(F.col("src"), F.lit(3))
    )
    # three edge blocks land before the first drain
    for p in (0, 1):
        g.where(F.col("part") == p).select("src", "dst").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    q = stream_degrees(spark, src_dir, ck_dir, query_name="degtest")
    q.awaitTermination()
    got = {
        r.id: (r.out_degree, r.in_degree)
        for r in spark.sql("SELECT * FROM degtest").collect()
    }
    batch_01 = g.where(F.col("part") != 2).select("src", "dst")
    want = {
        r.id: (r.out_degree, r.in_degree)
        for r in incremental_degrees(batch_01).collect()
    }
    assert got == want  # stream == batch on the drained blocks

    # a later block arrives; re-running with the SAME checkpoint folds in
    # only the new file (resumable block loading) and matches full batch
    g.where(F.col("part") == 2).select("src", "dst").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    q2 = stream_degrees(spark, src_dir, ck_dir, query_name="degtest")
    q2.awaitTermination()
    got2 = {
        r.id: (r.out_degree, r.in_degree)
        for r in spark.sql("SELECT * FROM degtest").collect()
    }
    want2 = {
        r.id: (r.out_degree, r.in_degree)
        for r in incremental_degrees(g.select("src", "dst")).collect()
    }
    assert got2 == want2


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    """The watermarked stream-stream inner join over two branches of one
    file stream must emit exactly the batch join's pairs — including
    across a file boundary that separates a click from its error."""
    from paragrapher_spark.streaming.events import (
        attribution_pairs,
        stream_attribution_pairs,
    )

    rows = [
        # user 1: click then error 3 min later (pair), error 20 min later (no)
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:03:00", 1, "error"),
        (3, "2024-01-01 10:25:00", 1, "error"),
        # user 2: two clicks before one error — both pair
        (4, "2024-01-01 11:00:00", 2, "click"),
        (5, "2024-01-01 11:05:00", 2, "click"),
        (6, "2024-01-01 11:08:00", 2, "error"),
        # user 3: error before any click — no pair
        (7, "2024-01-01 12:00:00", 3, "error"),
        (8, "2024-01-01 12:01:00", 3, "click"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )
    src = str(tmp_path / "ev_src")
    ckpt = str(tmp_path / "ev_ckpt")
    # file 1: everything up to user 2's first click; file 2: the rest —
    # the cross-file (4, 6) pair only emerges from buffered join state
    df.where("event_id <= 4").coalesce(1).write.mode("overwrite").parquet(src)
    df.where("event_id > 4").coalesce(1).write.mode("append").parquet(src)

    q = stream_attribution_pairs(spark, src, ckpt, "attr_t1")
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.click_id, r.error_id, r.gap_us)
        for r in spark.sql("SELECT * FROM attr_t1").collect()
    )
    want = sorted(
        (r.user_id, r.click_id, r.error_id, r.gap_us)
        for r in attribution_pairs(
            df.where("event_type = 'click'"),
            df.where("event_type = 'error'"),
        ).collect()
    )
    assert got == want
    assert (1, 1, 2, 180_000_000) in got
    assert (2, 4, 6, 480_000_000) in got  # the cross-file pair
    assert all(u != 3 for u, _, _, _ in got)


def test_last_click_attribution_picks_latest(spark):
    from paragrapher_spark.streaming.events import last_click_attribution

    rows = [
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:04:00", 1, "click"),   # latest before the error
        (3, "2024-01-01 10:05:00", 1, "error"),
        (4, "2024-01-01 10:05:00", 2, "click"),
        (5, "2024-01-01 10:05:00", 2, "click"),   # same ts: higher id wins
        (6, "2024-01-01 10:06:00", 2, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )
    got = {
        r.error_id: (r.click_id, r.gap_us)
        for r in last_click_attribution(df).collect()
    }
    assert got == {3: (2, 60_000_000), 6: (5, 60_000_000)}


def test_stream_exact_dedup_first_seen_across_restart(spark, tmp_path):
    """Stateful streaming dedup: first arrival of each content hash
    passes; duplicates are suppressed across microbatches AND across a
    checkpointed restart folding in new files."""
    from paragrapher_spark.streaming.events import stream_exact_dedup

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "docs_ckpt")
    batch1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 duplicates 1
        "doc_id long, text string",
    )
    out = str(tmp_path / "docs_out")
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_exact_dedup(spark, src, ckpt, out)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert len(got1) == 2 and 2 in got1 and len(got1 & {1, 3}) == 1

    # restart over new files: old hashes stay suppressed, new pass
    batch2 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], "doc_id long, text string"
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    q2 = stream_exact_dedup(spark, src, ckpt, out)
    q2.awaitTermination(120)
    got_all = {r.doc_id for r in spark.read.parquet(out).collect()}
    got2 = got_all - got1
    assert 5 in got2 and 4 not in got2 and 1 not in got2 and 3 not in got2

    # batch equivalence: the union of emitted ids is one rep per content
    from paragrapher_spark.operators.dedup import dedup_exact

    all_docs = batch1.unionByName(batch2)
    n_contents = dedup_exact(all_docs).count()
    assert len(got_all) == n_contents


def test_jsonl_roundtrip_and_loud_corrupt(spark, tmp_path):
    from paragrapher_spark.sources.sinks import read_jsonl, write_jsonl

    docs = spark.createDataFrame(
        [
            (1, "en", 'plain text'),
            (2, "de", 'quotes "and" backslash \\ tab\tnewline\nunicode é中'),
            (3, "es", ""),
        ],
        "doc_id long, lang string, text string",
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, path, num_files=2)
    back = read_jsonl(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))

    # corrupt line: FAILFAST raises; tolerate_corrupt counts and drops
    with open(f"{path}/zz_bad.json", "w") as f:
        f.write('{"doc_id": 9, "lang": "en", "text": "ok"}\n')
        f.write("{not json at all\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="FAILFAST|Malformed|corrupt|MALFORMED"):
        read_jsonl(spark, path).count()
    good, n_corrupt = read_jsonl(spark, path, tolerate_corrupt=True)
    assert n_corrupt == 1
    assert good.count() == 4  # 3 originals + the good injected line


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    from paragrapher_spark.streaming.events import stream_enriched_events

    ev = spark.createDataFrame(
        [(1, 10, "click"), (2, 11, "view"), (3, 12, "click")],
        "event_id long, user_id long, event_type string",
    )
    dim = spark.createDataFrame(
        [(10, "free"), (11, "pro")], "user_id long, tier string"
    )  # user 12 has no dim row -> inner join drops it
    src = str(tmp_path / "enr_src")
    ckpt = str(tmp_path / "enr_ckpt")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_enriched_events(spark, src, dim, ckpt, "enr_t1")
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.tier)
        for r in spark.sql("SELECT * FROM enr_t1").collect()
    )
    want = sorted(
        (r.event_id, r.tier) for r in ev.join(dim, on="user_id").collect()
    )
    assert got == want == [(1, "free"), (2, "pro")]
