"""Graph materialization sinks — the reference's converter clients.

The reference's test3..test8 decompress a WebGraph and materialize it as:
Graptor `.g3`/`.sg` binary CSR (`test/test3_converter_WG400.c:164-198`),
textual COO `.el` and adjacency `.adj` (test3:277-312), binary CSR with
positioned idempotent writes (`test/test4_bin_converter_WG400.c:25-63`),
u64->u32 narrowed ids (`test/test5_bin_converter_WG800.c:33-40`), and
weighted (dest,weight) pairs (`test/test6_bin_converter_WG404.c`).

Spark-native equivalents: sorted columnar parquet is the binary CSR (the
sort + parquet row-group min/max stats give the offsets' random-access
role); text writers give the GAPBS-compatible shapes. A `_meta.json`
sidecar carries |V|/|E| — the `.properties` analogue
(`src/webgraph.c:376-387`). Task-level idempotence (the positioned-write
trick of test4) is Spark's write-commit protocol — retried tasks replace
their own output files atomically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paragrapher_spark.graph import Graph
from paragrapher_spark.operators.indexing import prefix_sum


def write_csr(graph: Graph, path: str, num_partitions: int | None = None) -> None:
    """Materialize edges sorted by (src, dst) + an offsets table + metadata.

    The edge parquet is range-partitioned on src and sorted within
    partitions — parquet min/max column stats then give per-file vertex
    ranges, so a later `scan_edges(lo, hi)` prunes files exactly like the
    reference's offsets-directed block skipping (`src/WG400AP.java:156-165`).
    """
    n = num_partitions or graph.edges.sparkSession.sparkContext.defaultParallelism
    (
        graph.edges.repartitionByRange(n, "src", "dst")
        .sortWithinPartitions("src", "dst")
        .write.mode("overwrite")
        .parquet(f"{path}/edges")
    )
    graph.offsets().write.mode("overwrite").parquet(f"{path}/offsets")
    graph.vertices.write.mode("overwrite").parquet(f"{path}/vertices")
    meta = {"vertices_count": graph.num_vertices, "edges_count": graph.num_edges}
    tmp = f"{path}/_meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, f"{path}/_meta.json")


def read_csr(spark: SparkSession, path: str) -> Graph:
    """Open a materialized graph — `paragrapher_open_graph` shape: metadata
    comes from the sidecar, not a recount (`src/paragrapher.c:69-82`)."""
    with open(f"{path}/_meta.json") as fh:
        meta = json.load(fh)
    return Graph(
        vertices=spark.read.parquet(f"{path}/vertices"),
        edges=spark.read.parquet(f"{path}/edges"),
        num_vertices=meta["vertices_count"],
        num_edges=meta["edges_count"],
    )


def scan_edges(spark: SparkSession, path: str, start_vertex: int, end_vertex: int) -> DataFrame:
    """The reference's flagship subgraph scan (`paragrapher_csx_get_subgraph`,
    `src/paragrapher.c:157-178`): edges with src in [start_vertex,
    end_vertex). Declarative filter -> Catalyst pushes it to the parquet
    reader and prunes non-overlapping files via min/max stats."""
    return spark.read.parquet(f"{path}/edges").where(
        (F.col("src") >= start_vertex) & (F.col("src") < end_vertex)
    )


def write_edge_text(edges: DataFrame, path: str, single_file: bool = False) -> None:
    """GAPBS-style textual COO: one `src dst` line per edge, sorted —
    test3's `.el` writer (`test/test3_converter_WG400.c:277-287`).
    ``single_file`` coalesces to one part (only for small graphs; the
    distributed default writes sorted parts)."""
    out = (
        edges.select(
            F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string")).alias(
                "value"
            ),
            "src",
            "dst",
        )
        .repartitionByRange(1 if single_file else 8, "src", "dst")
        .sortWithinPartitions("src", "dst")
        .select("value")
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_adjacency_text(graph: Graph, path: str) -> None:
    """AdjacencyGraph textual format (test3:289-312): header with counts,
    then offsets, then destinations — written as one text file (the format
    is inherently sequential; used for small-graph interchange only)."""
    offsets = [
        r.offset for r in graph.offsets().orderBy("id").select("offset").collect()
    ]
    dests = [
        r.dst
        for r in graph.edges.orderBy("src", "dst").select("dst").collect()
    ]
    lines = ["AdjacencyGraph", str(graph.num_vertices), str(graph.num_edges)]
    lines += [str(o) for o in offsets]
    lines += [str(d) for d in dests]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def narrow_ids(edges: DataFrame) -> DataFrame:
    """u64 -> u32 narrowing (test5:33-40): cast src/dst to int after a
    range assertion — the reference narrows only when |V| < 2^32."""
    mx = edges.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("m")
    ).collect()[0]["m"]
    if mx is not None and mx >= (1 << 31):
        raise ValueError(f"vertex id {mx} does not fit in int32")
    out = edges.withColumn("src", F.col("src").cast("int")).withColumn(
        "dst", F.col("dst").cast("int")
    )
    return out


def edge_checksum(edges: DataFrame) -> int:
    """Order-insensitive content checksum of an edge table — replaces the
    reference's order-sensitive converter checksum (test3:303) which cannot
    be stable under distributed write ordering."""
    row = edges.agg(
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h")
    ).collect()[0]
    return int(row["h"])
