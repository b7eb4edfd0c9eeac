"""Binary CSR interchange files — the reference's test3/test4 emitters.

Two on-disk layouts, both little-endian:

- ``bin`` (`test/test4_bin_converter_WG400.c:151-175`):
  ``u64 n | u64 m | u64 offsets[n+1] | u32 edges[m]``
- ``g3`` — Graptor V3 / GAP-".sg"-style serialized CSR
  (`test/test3_converter_WG400.c:10-26,183-198`): a 64-byte header
  ``u64[8] = {3, 1, n, m, 4, 8, 0, 0}`` followed by the same
  ``u64 offsets[n+1] | u32 edges[m]`` body.

The reference writes these with positioned ``pwrite``s from concurrent
callbacks (`test/test4_bin_converter_WG400.c:25-63`): every callback seeks
to ``header + 8*(n+1) + 4*global_edge_index`` and writes its block. The
Spark-native equivalent below keeps exactly that shape — each task owns a
contiguous byte range (contiguity follows from the global (src, dst)
range-sort; the CSR adjacency concatenation IS that sort order) and
position-writes it independently. Positioned writes are idempotent, so
Spark task retries are safe, same as the reference's callback replays.

Scale notes (100 TB):
- The writer never funnels data through the driver: the driver writes the
  fixed-size header + the ``offsets[n] = m`` sentinel; tasks write their
  own slices in parallel.
- The reader never loads the offsets array: partition boundaries are found
  by O(P log n) binary-search *seeks* into the offsets region (targeting
  equal EDGE counts per task — edge-balanced, so a power-law giant
  adjacency does not skew one task), then each task reads only its own
  offsets/edges byte slices.
- Positioned single-file writes assume a POSIX-seekable target (local
  disk / NFS / Lustre — the reference's own deployment shape). For object
  stores, write per-task part files and compose, as the text writers do.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paragrapher_spark.graph import Graph
from paragrapher_spark.operators.indexing import _partition_bases

_G3_HEADER_WORDS = 8


def _header_bytes(fmt: str, n: int, m: int) -> bytes:
    if fmt == "bin":
        return struct.pack("<QQ", n, m)
    if fmt == "g3":
        return struct.pack("<8Q", 3, 1, n, m, 4, 8, 0, 0)
    raise ValueError(f"unknown binary CSR format {fmt!r} (want 'bin' or 'g3')")


def _parse_header(raw: bytes, fmt: str) -> tuple[int, int, int]:
    """Returns (n, m, header_size)."""
    if fmt == "bin":
        n, m = struct.unpack_from("<QQ", raw)
        return n, m, 16
    if fmt == "g3":
        words = struct.unpack_from("<8Q", raw)
        if words[0] != 3 or words[4] != 4 or words[5] != 8:
            raise ValueError(
                f"not a Graptor-V3 file: header {words[:6]} (want version 3, "
                "4-byte vids, 8-byte eids)"
            )
        return words[2], words[3], 64
    raise ValueError(f"unknown binary CSR format {fmt!r} (want 'bin' or 'g3')")


def write_binary_csr(
    graph: Graph,
    path: str,
    fmt: str = "bin",
    num_partitions: int | None = None,
) -> None:
    """Materialize ``graph`` as a single binary CSR file (layouts above).

    Vertex ids must be dense ``0..n-1`` (the reference's id space, SURVEY
    §1.4) — the positional offsets array has no other meaning; each task
    asserts its id run is gapless and in-range, loud-failure style.
    Destinations must fit u32 (the reference narrows identically,
    `test/test5_bin_converter_WG800.c:33-40`).
    """
    spark = graph.edges.sparkSession
    n, m = graph.num_vertices, graph.num_edges
    header = _header_bytes(fmt, n, m)
    off_base = len(header)
    edge_base = off_base + 8 * (n + 1)
    nparts = num_partitions or spark.sparkContext.defaultParallelism

    # driver: preallocate, header, and the offsets[n] = m sentinel — the
    # only three driver-side writes regardless of graph size (test4's
    # ftruncate + header write, test4:157-169)
    with open(path, "wb") as fh:
        fh.truncate(edge_base + 4 * m)
        fh.write(header)
        fh.seek(off_base + 8 * n)
        fh.write(struct.pack("<Q", m))

    # offsets region: dense-id range partitions are contiguous id runs, so
    # each task position-writes one u64 slice at off_base + 8 * first_id
    offs = (
        graph.offsets()
        .select("id", "offset")
        .repartitionByRange(nparts, "id")
        .sortWithinPartitions("id")
    )

    def _write_offsets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        written = 0
        with open(path, "r+b") as fh:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["id"].to_numpy()
                if ids[0] < 0 or ids[-1] >= n or not np.all(np.diff(ids) == 1):
                    raise ValueError(
                        "binary CSR requires dense gapless vertex ids "
                        f"0..{n - 1}; got run [{ids[0]}, {ids[-1]}] with gaps"
                    )
                fh.seek(off_base + 8 * int(ids[0]))
                fh.write(pdf["offset"].to_numpy(np.uint64).astype("<u8").tobytes())
                written += len(pdf)
        yield pd.DataFrame({"rows": [written]})

    wrote_offs = (
        offs.mapInPandas(_write_offsets, schema="rows long")
        .agg(F.sum("rows"))
        .collect()[0][0]
    )
    if wrote_offs != n:
        raise ValueError(
            f"offsets write covered {wrote_offs} of {n} vertices — the "
            "vertex table is not the dense 0..n-1 id space"
        )

    # edges region: global (src, dst) sort == adjacency concatenation
    # order; per-partition edge bases come from the two-phase prefix-sum
    # trick (O(#partitions) on the driver), then each task streams its
    # contiguous u32 slice with one seek per Arrow batch
    edges = (
        graph.edges.select("src", "dst")
        .repartitionByRange(nparts, "src", "dst")
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    try:
        bases = _partition_bases(edges, F.count(F.lit(1)))

        def _write_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            eid = bases.get(TaskContext.get().partitionId(), 0)
            written = 0
            with open(path, "r+b") as fh:
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    dst = pdf["dst"].to_numpy()
                    if dst.min() < 0 or dst.max() >= (1 << 32):
                        raise ValueError(
                            f"destination id {dst.max()} does not fit u32 "
                            "(reference narrows identically, test5:33-40)"
                        )
                    fh.seek(edge_base + 4 * eid)
                    fh.write(dst.astype("<u4").tobytes())
                    eid += len(pdf)
                    written += len(pdf)
            yield pd.DataFrame({"rows": [written]})

        wrote_edges = (
            edges.mapInPandas(_write_edges, schema="rows long")
            .agg(F.sum("rows"))
            .collect()[0][0]
        ) or 0
        if wrote_edges != m:
            raise ValueError(
                f"edge write covered {wrote_edges} of {m} edges — edge table "
                "disagrees with Graph.num_edges"
            )
    finally:
        edges.unpersist()


def _balanced_vertex_ranges(
    path: str, off_base: int, n: int, m: int, nparts: int
) -> list[tuple[int, int, int, int]]:
    """Edge-balanced partition plan [(v_lo, v_hi, e_lo, e_hi)] found by
    binary-searching the on-disk offsets array with seeks — O(P log n)
    reads of 8 bytes each, never materializing the array (the scale
    property the reference gets from mmap, `src/webgraph.c:614-615`)."""

    def off_at(v: int, fh) -> int:
        fh.seek(off_base + 8 * v)
        return struct.unpack("<Q", fh.read(8))[0]

    bounds = [0]
    with open(path, "rb") as fh:
        for j in range(1, nparts):
            target = j * m // nparts
            lo, hi = bounds[-1], n  # offsets are monotone
            while lo < hi:
                mid = (lo + hi) // 2
                if off_at(mid, fh) < target:
                    lo = mid + 1
                else:
                    hi = mid
            bounds.append(lo)
        bounds.append(n)
        ranges = []
        for v_lo, v_hi in zip(bounds, bounds[1:]):
            if v_lo == v_hi:
                continue
            ranges.append((v_lo, v_hi, off_at(v_lo, fh), off_at(v_hi, fh)))
    return ranges


def read_binary_csr(
    spark: SparkSession,
    path: str,
    fmt: str = "bin",
    num_partitions: int | None = None,
) -> Graph:
    """Open a binary CSR file as a Graph — distributed: each task reads
    only its own offsets/edges byte slices (plan from
    :func:`_balanced_vertex_ranges`)."""
    with open(path, "rb") as fh:
        n, m, hs = _parse_header(fh.read(64), fmt)
    off_base = hs
    edge_base = hs + 8 * (n + 1)
    expect = edge_base + 4 * m
    actual = os.path.getsize(path)
    if actual != expect:
        raise ValueError(
            f"binary CSR {path!r} is {actual} bytes but the header "
            f"(n={n}, m={m}) implies {expect} — truncated or corrupt"
        )
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    plan = _balanced_vertex_ranges(path, off_base, n, m, max(1, nparts))
    plan_df = spark.createDataFrame(
        plan or [(0, 0, 0, 0)], "v_lo long, v_hi long, e_lo long, e_hi long"
    ).repartition(max(1, len(plan)))

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for v_lo, v_hi, e_lo, e_hi in pdf.itertuples(index=False):
                if v_hi == v_lo:
                    continue
                with open(path, "rb") as fh:
                    fh.seek(off_base + 8 * v_lo)
                    offs = np.frombuffer(
                        fh.read(8 * (v_hi - v_lo + 1)), dtype="<u8"
                    ).astype(np.int64)
                    fh.seek(edge_base + 4 * e_lo)
                    dst = np.frombuffer(
                        fh.read(4 * (e_hi - e_lo)), dtype="<u4"
                    ).astype(np.int64)
                deg = np.diff(offs)
                src = np.repeat(np.arange(v_lo, v_hi, dtype=np.int64), deg)
                # chunked emission keeps Arrow batches bounded even when a
                # single task's slice is large
                step = 1 << 20
                for i in range(0, len(src), step):
                    yield pd.DataFrame(
                        {
                            "src": src[i : i + step],
                            "dst": dst[i : i + step],
                            "weight": np.ones(
                                len(src[i : i + step]), dtype=np.int64
                            ),
                        }
                    )

    edges = plan_df.mapInPandas(_read, schema="src long, dst long, weight long")
    vertices = spark.range(n).select(
        F.col("id"),
        F.lit(None).cast("string").alias("repo"),
        F.lit(None).cast("string").alias("path"),
    )
    return Graph(vertices=vertices, edges=edges, num_vertices=n, num_edges=m)
