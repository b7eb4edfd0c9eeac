"""Engine facade — explicit 1:1 parity with the reference's public API.

ParaGrapher's public surface is 12 functions over an opaque graph handle
(`include/paragrapher.h`; dispatch in `src/paragrapher.c`). This module is
the parity map made executable: one method per reference function, each
delegating to the Spark-native implementation that SURVEY.md §2.1 assigns
to it. Nothing here adds engine logic — it exists so a reference user can
switch by symbol name, and so the coverage claim is checkable line by line.

| reference (include/paragrapher.h)                | here                      |
|--------------------------------------------------|---------------------------|
| `paragrapher_init`                               | `Engine()` / `get_spark`  |
| `paragrapher_open_graph`                         | `Engine.open_graph`       |
| `paragrapher_release_graph`                      | `Engine.release_graph`    |
| `paragrapher_get_set_options` (12 request types) | `Engine.get_option` /     |
|                                                  | `Engine.set_option`       |
| `paragrapher_csx_get_offsets`                    | `Engine.get_offsets`      |
| `paragrapher_csx_get_vertex_weights` (NULL stub  | `Engine.get_vertex_weights`|
|   in every reference reader, src/webgraph.c:1143)|   (vertex-attr join)      |
| `paragrapher_csx_release_offsets_weights_arrays` | `Engine.release` (no-op / |
|                                                  |   unpersist)              |
| `paragrapher_csx_get_subgraph`                   | `Engine.scan_edges`       |
| `paragrapher_csx_release_read_buffers`           | automatic (Arrow batch    |
|                                                  |   lifetime) — `release`   |
| `paragrapher_csx_release_read_request`           | `Engine.release`          |
| `paragrapher_coo_get_edges` (declared, never     | `Engine.scan_edges_rows`  |
|   implemented, src/paragrapher.c:37)             |                           |
| callback `paragrapher_csx_callback`              | the fn given to           |
|                                                  |   `Engine.for_each_block` |
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paragrapher_spark.graph import Graph, edges_from_corpus, graph_from_edges
from paragrapher_spark.sources.sinks import (
    read_csr,
    read_matrix_market,
    scan_edges,
)


class Engine:
    """Session + options + graph registry (the reference's library state:
    `paragrapher_init` registers per-format readers, `src/paragrapher.c:45-67`;
    here the "formats" are loaders keyed by source kind)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        # SET/GET_BUFFER_SIZE & SET/GET_MAX_BUFFERS_COUNT analogues
        # (`src/webgraph.c:472-502`): rows per scan batch and parallelism.
        self._options: dict[str, Any] = {
            "buffer_size": 1 << 20,  # rows per Arrow batch-ish unit
            "max_buffers_count": spark.sparkContext.defaultParallelism,
        }
        self._graphs: list[Graph] = []
        # GET_GRAPH_PATH backing store (`src/webgraph.c:452-454`): the
        # source path per handle (None for in-memory DataFrame sources).
        self._paths: dict[int, str | None] = {}
        # READ_* progress telemetry per handle (`src/webgraph.c:504-550`):
        # Spark accumulators updated from inside the callback tasks — the
        # engine-native analogue of the reference's poll-able counters
        # (they advance as tasks complete, while the scan is running).
        self._reads: dict[int, dict[str, Any]] = {}

    # -- paragrapher_open_graph / release_graph ------------------------------

    def open_graph(self, source: str | DataFrame, kind: str = "csr") -> Graph:
        """kind='csr': a directory written by sinks.write_csr (the
        reference's on-disk graph + `.properties` metadata). kind='corpus':
        an Iceberg/parquet corpus table or path -> import-graph extraction.
        kind='edges': a raw (src, dst[, weight]) DataFrame.
        kind='webgraph': a BVGraph basename (`.graph`/`.offsets`/
        `.properties`) — the reference's PARAGRAPHER_CSX_WG_400_AP format
        (`src/webgraph.c:84-390`), decoded natively.
        kind='bin'/'g3': the reference's uncompressed binary CSR
        interchange files (test4 / test3 layouts).
        kind='mtx': MatrixMarket coordinate file — the COO graph kinds the
        reference declared but never shipped (PARAGRAPHER_COO_MM_400_SS /
        _404_SS, `include/paragrapher.h:28-29`, `src/paragrapher.c:56-57`).
        kind='snapshot': a sources/table_format snapshot table of the
        corpus (append ':vN' to the path to time-travel) -> import-graph
        extraction over exactly that version's rows."""
        if kind == "csr":
            g = read_csr(self.spark, source)  # type: ignore[arg-type]
        elif kind == "corpus":
            df = (
                self.spark.read.parquet(source)
                if isinstance(source, str)
                else source
            )
            g = edges_from_corpus(df)
        elif kind == "edges":
            g = graph_from_edges(source)  # type: ignore[arg-type]
        elif kind == "webgraph":
            from paragrapher_spark.sources.webgraph import read_webgraph

            g = read_webgraph(self.spark, source)  # type: ignore[arg-type]
        elif kind in ("bin", "g3"):
            from paragrapher_spark.sources.binary import read_binary_csr

            g = read_binary_csr(self.spark, source, fmt=kind)  # type: ignore[arg-type]
        elif kind == "mtx":
            g = read_matrix_market(self.spark, source)  # type: ignore[arg-type]
        elif kind == "snapshot":
            from paragrapher_spark.sources.table_format import read_table

            path, _, ver = str(source).partition(":v")
            df = read_table(
                self.spark, path, version=int(ver) if ver else None
            )
            g = edges_from_corpus(df)
        else:
            raise ValueError(f"unknown graph kind: {kind}")
        self._graphs.append(g)
        self._paths[id(g)] = source if isinstance(source, str) else None
        return g

    def release_graph(self, graph: Graph) -> None:
        """`paragrapher_release_graph` (`src/webgraph.c:392-437`):
        unpersist cached state."""
        graph.edges.unpersist()
        graph.vertices.unpersist()
        if graph in self._graphs:
            self._graphs.remove(graph)
        self._paths.pop(id(graph), None)
        self._reads.pop(id(graph), None)
        graph.edge_index = None
        graph._offsets = None

    # -- paragrapher_get_set_options ----------------------------------------

    def get_option(self, graph: Graph | None, request: str) -> Any:
        """The reference's request types (`src/webgraph.c:450-554`), all 12
        reachable by symbol:

        - ``graph_path`` — GET_GRAPH_PATH (`webgraph.c:452-454`): the
          source path the handle was opened from (None for DataFrames).
        - ``read_status`` — READ_STATUS (`webgraph.c:504-511`):
          ``not_started`` (no scan issued) / ``reading`` / ``complete``.
        - ``read_total_callbacks`` — READ_TOTAL_CALLBACKS
          (`webgraph.c:513-520`): callback invocations completed so far.
        - ``read_edges`` — READ_EDGES (`webgraph.c:522-530`): edges
          delivered to the callback so far (poll while a scan runs).

        Accuracy contract for the READ_* counters: they are accumulator-
        backed and assume ONE full action per ``for_each_block`` call —
        the reference's usage shape (test1:189-205 issues one request and
        polls it). A partial action (``limit``) leaves status at
        ``reading``; re-running an action on the same result, or task
        retries/speculation, re-add updates so counters can overshoot.
        Call ``for_each_block`` again to reset them for a new scan.
        """
        if request == "vertices_count":
            return graph.num_vertices  # from metadata, like `.properties`
        if request == "edges_count":
            return graph.num_edges
        if request == "lib_uses_own_buffers":
            return True  # Arrow batches are executor-owned
        if request == "lib_uses_user_arrays":
            return False
        if request == "graph_path":
            return self._paths.get(id(graph))
        if request in ("read_status", "read_total_callbacks", "read_edges"):
            info = self._reads.get(id(graph))
            if request == "read_status":
                if info is None:
                    return "not_started"
                if "request" in info:  # async handle: authoritative status
                    return info["request"].status
                done = graph is not None and info["rows"].value >= graph.num_edges
                return "complete" if done else "reading"
            if info is None:
                return 0
            key = "callbacks" if request == "read_total_callbacks" else "rows"
            return info[key].value
        if request in self._options:
            return self._options[request]
        raise KeyError(request)

    def set_option(self, request: str, value: Any) -> None:
        if request not in ("buffer_size", "max_buffers_count"):
            raise KeyError(request)
        self._options[request] = value

    # -- paragrapher_csx_get_offsets / vertex_weights ------------------------

    def get_offsets(self, graph: Graph) -> DataFrame:
        """(id, out_degree, offset) — the u64 offsets array as a table
        (`src/webgraph.c:601-711`; prefix sum `src/WG400AP.java:237-252`)."""
        return graph.offsets()

    def get_vertex_weights(self, graph: Graph, weights: DataFrame) -> DataFrame:
        """Reference declares but never implements this (NULL in every
        reader, `src/webgraph.c:1143`); here it is the trivial
        vertex-attribute join: weights(id, ...) onto the vertex table."""
        return graph.vertices.join(weights, on="id", how="left")

    def release(self, *dfs: DataFrame) -> None:
        """Release offsets/read buffers/read request
        (`src/paragrapher.c:141-213`): unpersist; Arrow batch lifetime is
        automatic."""
        for df in dfs:
            df.unpersist()

    # -- paragrapher_csx_get_subgraph (the flagship scan) --------------------

    def scan_edges(self, graph_or_path: Graph | str, start_vertex: int, end_vertex: int) -> DataFrame:
        """Edges with src in half-open [start_vertex, end_vertex) — the
        edge-block scan (`src/webgraph.c:1036-1091`). Against a write_csr
        directory the predicate prunes parquet files via min/max stats (the
        offsets-directed block skip, `src/WG400AP.java:156-165`)."""
        if isinstance(graph_or_path, str):
            return scan_edges(self.spark, graph_or_path, start_vertex, end_vertex)
        return graph_or_path.edges.where(
            (F.col("src") >= start_vertex) & (F.col("src") < end_vertex)
        )

    def scan_edges_rows(self, graph: Graph, start_row: int, end_row: int) -> DataFrame:
        """`paragrapher_coo_get_edges` — declared in the reference API but
        never implemented (`src/paragrapher.c:37`); trivial here: rows
        [start_row, end_row) of the edge table in (src, dst) order, via a
        global edge index (the offsets prefix-sum applied at edge grain).

        The index is built ONCE per handle and cached on it — repeat scans
        filter the materialized index instead of re-running the prefix sum
        (the reference mmaps its offsets once, `src/webgraph.c:614-615`)."""
        if graph.edge_index is None:
            from paragrapher_spark.operators.indexing import prefix_sum

            w = graph.edges.select("src", "dst").withColumn("_one", F.lit(1))
            # prefix_sum range-partitions + sorts and returns an eagerly
            # materialized (localCheckpoint) table — the cache is real data
            graph.edge_index = prefix_sum(
                w, ["src", "dst"], "_one", out_col="eid"
            ).drop("_one")
        return graph.edge_index.where(
            (F.col("eid") >= start_row) & (F.col("eid") < end_row)
        ).select("src", "dst")

    # -- callback surface ----------------------------------------------------

    def for_each_block(
        self,
        graph: Graph,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema: str,
    ) -> DataFrame:
        """The user-callback contract (`paragrapher_csx_callback`,
        `include/paragrapher.h:93`): ``fn`` receives whole edge batches
        (pandas frames over Arrow — the shm slab analogue,
        `src/webgraph.c:843-889`) and returns result batches.

        Progress telemetry: per-graph accumulators count callback
        invocations and edges delivered; poll them through
        ``get_option(graph, "read_status" | "read_total_callbacks" |
        "read_edges")`` while the scan runs — the reference's READ_*
        request family (`src/webgraph.c:504-550`)."""
        sc = self.spark.sparkContext
        rows_acc = sc.accumulator(0)
        calls_acc = sc.accumulator(0)
        self._reads[id(graph)] = {"rows": rows_acc, "callbacks": calls_acc}

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                out = fn(pdf)
                calls_acc.add(1)
                rows_acc.add(len(pdf))
                yield out

        return graph.edges.mapInPandas(batches, schema=schema)

    def for_each_block_async(
        self,
        graph: Graph,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema: str,
        action: Callable[[DataFrame], Any] | None = None,
    ) -> "ReadRequest":
        """The reference's flagship NON-BLOCKING shape: `csx_get_subgraph`
        returns a `paragrapher_read_request*` immediately and the caller
        polls READ_STATUS / READ_EDGES while the library reads
        (`src/webgraph.c:1036-1091`; status poll 504-518; the test clients
        sleep-poll it, `test/test4_bin_converter_WG400.c:196-218`).

        The mapped DataFrame's ``action`` (default: ``count``) runs on a
        daemon thread — Spark job submission is thread-safe, so the scan
        proceeds concurrently with driver-side polling. The returned
        handle exposes ``status`` (not_started → reading → complete /
        failed), the accumulator-backed progress counters, and ``wait()``
        for the action's result; ``get_option(graph, "read_*")`` sees the
        same handle, completing the symbol-level parity."""
        import threading

        df = self.for_each_block(graph, fn, schema)
        info = self._reads[id(graph)]
        req = ReadRequest(
            _rows=info["rows"],
            _calls=info["callbacks"],
            _total_edges=graph.num_edges,
        )
        info["request"] = req
        act = action or (lambda d: d.count())

        def run() -> None:
            req._status = "reading"
            try:
                req.result = act(df)
                req._status = "complete"
            except BaseException as exc:  # noqa: BLE001 — surfaced on wait()
                req.error = exc
                req._status = "failed"
            finally:
                req._done.set()

        req._thread = threading.Thread(
            target=run, name="paragrapher-read-request", daemon=True
        )
        req._thread.start()
        return req


class ReadRequest:
    """Poll-able handle for an in-flight scan — the
    `paragrapher_read_request` analogue (`include/paragrapher.h:63-74`).

    ``status``/``read_edges``/``read_callbacks`` can be read from the
    calling thread while the action runs on the handle's daemon thread;
    edge counts advance as Spark tasks complete (accumulator updates ship
    with task results), so a mid-scan poll observes monotonically
    increasing progress exactly like the reference's READ_EDGES counter
    (`src/webgraph.c:522-530`)."""

    def __init__(self, _rows: Any, _calls: Any, _total_edges: int) -> None:
        import threading

        self._rows = _rows
        self._calls = _calls
        self._total_edges = _total_edges
        self._status = "not_started"
        self._done = threading.Event()
        self._thread: Any = None
        self.result: Any = None
        self.error: BaseException | None = None

    @property
    def status(self) -> str:
        return self._status

    @property
    def read_edges(self) -> int:
        return self._rows.value

    @property
    def read_callbacks(self) -> int:
        return self._calls.value

    def wait(self, timeout: float | None = None) -> Any:
        """Block until the scan's action completes; returns its result.
        Raises the action's exception if it failed — loud-failure, the
        repo standard."""
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"read request still {self._status} after {timeout}s"
            )
        if self.error is not None:
            raise self.error
        return self.result
