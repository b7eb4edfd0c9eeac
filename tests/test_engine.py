"""Engine facade parity tests (reference: include/paragrapher.h's 12
public functions — see paragrapher_spark/engine.py's mapping table)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from paragrapher_spark.engine import Engine
from paragrapher_spark.graph import graph_from_edges
from paragrapher_spark.sources.sinks import write_csr

EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 4)]


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def graph(spark, engine):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return engine.open_graph(df, kind="edges")


def test_metadata_options(engine, graph):
    # GET_VERTICES_COUNT / GET_EDGES_COUNT (src/webgraph.c:456-462)
    assert engine.get_option(graph, "vertices_count") == 5
    assert engine.get_option(graph, "edges_count") == 6
    # memory-ownership contract (src/webgraph.c:464-470)
    assert engine.get_option(graph, "lib_uses_own_buffers") is True
    assert engine.get_option(graph, "lib_uses_user_arrays") is False
    engine.set_option("buffer_size", 1234)
    assert engine.get_option(None, "buffer_size") == 1234
    with pytest.raises(KeyError):
        engine.get_option(graph, "nonsense")
    with pytest.raises(KeyError):
        engine.set_option("vertices_count", 7)


def test_offsets(engine, graph):
    rows = {r.id: (r.out_degree, r.offset) for r in engine.get_offsets(graph).collect()}
    # offsets = exclusive prefix sum of out-degrees over id order
    # (src/WG400AP.java:237-252); last offset + degree == |E|
    assert rows[0] == (2, 0)
    assert rows[1] == (1, 2)
    assert rows[2] == (1, 3)
    assert rows[3] == (2, 4)
    assert rows[4] == (0, 6)


def test_scan_edges_vertex_range(engine, graph):
    got = sorted(
        (r.src, r.dst) for r in engine.scan_edges(graph, 1, 3).collect()
    )
    assert got == [(1, 2), (2, 3)]


def test_scan_edges_rows(engine, graph):
    got = sorted(
        (r.src, r.dst) for r in engine.scan_edges_rows(graph, 2, 5).collect()
    )
    # rows 2..4 of the (src, dst)-ordered edge list
    assert got == sorted(sorted(EDGES)[2:5])


def test_scan_csr_path_prunes(engine, graph, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csr"))
    write_csr(graph, path, num_partitions=2)
    got = sorted(
        (r.src, r.dst) for r in engine.scan_edges(path, 0, 1).collect()
    )
    assert got == [(0, 1), (0, 2)]


def test_vertex_weights_join(engine, graph, spark):
    w = spark.createDataFrame([(0, 10.0), (3, 30.0)], "id long, w double")
    got = {r.id: r.w for r in engine.get_vertex_weights(graph, w).collect()}
    assert got[0] == 10.0 and got[3] == 30.0
    assert got[1] is None  # left join: unweighted vertices kept


def test_for_each_block_callback(engine, graph):
    # the user-callback surface: batch-at-a-time, like the reference's
    # buffer callback (include/paragrapher.h:93)
    def cb(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(pdf["src"].sum() + pdf["dst"].sum())]})

    total = (
        engine.for_each_block(graph, cb, schema="s long")
        .agg(F.sum("s").alias("t"))
        .collect()[0]["t"]
    )
    assert total == sum(s + d for s, d in EDGES)


def test_graph_path_option(engine, graph, spark, tmp_path_factory):
    # GET_GRAPH_PATH (src/webgraph.c:452-454): path-opened handles report
    # their source; in-memory DataFrame handles report None
    path = str(tmp_path_factory.mktemp("csr_path"))
    write_csr(graph, path, num_partitions=2)
    g2 = engine.open_graph(path, kind="csr")
    assert engine.get_option(g2, "graph_path") == path
    assert engine.get_option(graph, "graph_path") is None
    engine.release_graph(g2)


def test_read_progress_options(engine, spark):
    # READ_STATUS / READ_TOTAL_CALLBACKS / READ_EDGES
    # (src/webgraph.c:504-550): poll-able progress counters
    df = spark.createDataFrame(EDGES, "src long, dst long")
    g = engine.open_graph(df, kind="edges")
    assert engine.get_option(g, "read_status") == "not_started"
    assert engine.get_option(g, "read_edges") == 0
    assert engine.get_option(g, "read_total_callbacks") == 0

    def cb(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[["src"]]

    engine.for_each_block(g, cb, schema="src long").count()
    assert engine.get_option(g, "read_edges") == len(EDGES)
    assert engine.get_option(g, "read_total_callbacks") >= 1
    assert engine.get_option(g, "read_status") == "complete"
    engine.release_graph(g)
    assert engine.get_option(g, "read_status") == "not_started"


def test_scan_edges_rows_index_cached(engine, graph, monkeypatch):
    # the global edge index is built once per handle (the reference's
    # mmap-once economics, src/webgraph.c:614-615): a second row-range
    # scan must not re-run the prefix sum
    first = sorted(
        (r.src, r.dst) for r in engine.scan_edges_rows(graph, 0, 3).collect()
    )
    assert graph.edge_index is not None
    import paragrapher_spark.operators.indexing as indexing

    def boom(*a, **kw):  # pragma: no cover - should never run
        raise AssertionError("prefix_sum re-ran on a cached handle")

    monkeypatch.setattr(indexing, "prefix_sum", boom)
    second = sorted(
        (r.src, r.dst) for r in engine.scan_edges_rows(graph, 0, 3).collect()
    )
    assert first == second == sorted(sorted(EDGES)[0:3])


def test_release_graph(engine, graph):
    engine.release_graph(graph)
    assert graph not in engine._graphs


def test_async_read_request_polls_during_scan(engine, spark):
    # the reference's non-blocking flagship shape: csx_get_subgraph
    # returns a request that the caller sleep-polls with READ_STATUS /
    # READ_EDGES while the library reads (src/webgraph.c:504-550;
    # client loop test/test4_bin_converter_WG400.c:196-218). A slow
    # callback staggers task completions across several scheduler waves
    # so the mid-scan poll observes partial, monotonically increasing
    # progress.
    import time

    n = 4000
    df = (
        spark.range(n)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(128)
    )
    g = engine.open_graph(df, kind="edges")

    def slow_cb(pdf: pd.DataFrame) -> pd.DataFrame:
        time.sleep(0.15)
        return pdf[["src"]]

    req = engine.for_each_block_async(g, slow_cb, schema="src long")
    samples: list[tuple[str, int]] = []
    while not req._done.is_set():
        samples.append((req.status, req.read_edges))
        assert engine.get_option(g, "read_status") == req.status
        time.sleep(0.005)
    assert req.wait(30) == n
    assert req.status == "complete"
    assert engine.get_option(g, "read_status") == "complete"
    assert req.read_edges == n
    assert req.read_callbacks >= 1
    # observed mid-scan: some sample strictly between 0 and |E|, and the
    # edge counter never decreased
    counts = [c for _, c in samples]
    assert any(s == "reading" and 0 < c < n for s, c in samples)
    assert all(a <= b for a, b in zip(counts, counts[1:]))
    engine.release_graph(g)


def test_async_read_request_failure_is_loud(engine, spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    g = engine.open_graph(df, kind="edges")

    def bad_cb(pdf: pd.DataFrame) -> pd.DataFrame:
        raise RuntimeError("boom in callback")

    req = engine.for_each_block_async(g, bad_cb, schema="src long")
    with pytest.raises(Exception, match="boom"):
        req.wait(60)
    assert req.status == "failed"
    engine.release_graph(g)
