"""Streaming edge ingestion — incremental degree maintenance.

The reference's loader streams edge BLOCKS into user callbacks while a
poll loop reports progress (`src/webgraph.c:504-550,1036-1091`); its
analytics then run over the fully-loaded graph. This module is the
Structured-Streaming re-expression of that ingestion shape for the one
graph statistic that is incrementally maintainable with tiny state:
degrees. Edge blocks land as files; every micro-batch folds the new
edges into running per-vertex in/out-degree totals — the "graph is still
loading but the degree distribution is already queryable" capability.

Unified-API discipline (streaming/events.py): ``incremental_degrees`` is
one DataFrame transform that works identically on a batch frame and a
readStream frame — the batch==stream equality test IS the correctness
argument, and the batch twin is the same aggregation the oracle-gated
``in_degree_dist``/``degree_topk`` queries run.

Streaming-legal shape: a single groupBy aggregation (edges exploded to
(id, out?, in?) rows first — two streaming aggs + a join would be
illegal in one query). State is |V| rows of two longs; no watermark
needed (degrees never expire). 100 TB: the agg is map-side combinable;
hub skew lands in the partial aggregates, not a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [StructField("src", LongType()), StructField("dst", LongType())]
)


def incremental_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree) running totals over edges(src, dst).

    Works on batch and streaming inputs alike — a streaming input needs
    outputMode complete/update (the state is the running totals).
    Parallel edges count multiply (degree of the multigraph); dedup
    upstream if simple-graph degrees are wanted.
    """
    rows = edges.select(
        F.col("src").alias("id"),
        F.lit(1).cast("long").alias("o"),
        F.lit(0).cast("long").alias("i"),
    ).unionByName(
        edges.select(
            F.col("dst").alias("id"),
            F.lit(0).cast("long").alias("o"),
            F.lit(1).cast("long").alias("i"),
        )
    )
    return rows.groupBy("id").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


def stream_degrees(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_degrees",
):
    """Fold parquet edge blocks landing in ``source_dir`` into running
    degree totals, exposed as the in-memory table ``query_name``.

    Trigger availableNow: drains everything currently in the directory
    then stops — re-running with the same ``checkpoint_dir`` processes
    ONLY files that arrived since (exactly-once over the file log), the
    resumable-block-loading semantics of the reference's read request.
    Returns the StreamingQuery (call ``awaitTermination()``).
    """
    src = spark.readStream.schema(EDGE_SCHEMA).parquet(source_dir)
    return (
        incremental_degrees(src)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
