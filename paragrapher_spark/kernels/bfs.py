"""Multi-source BFS — frontier-superstep reachability/distance kernel.

Not a reference client workload (its clients are degree/WCC/converters),
but the canonical frontier-driven traversal of a link-graph engine and the
op that makes the checkpoint manifest's ``frontier_size`` metric literal
(north rule: per-superstep metrics). Same execution discipline as the
other kernels: driver work O(1) scalars per superstep, edge table
repartitioned once, frontier/distances localCheckpointed per superstep,
resumable via CheckpointManager.

Per superstep: neighbors of the frontier (one equi-join on the persisted
edge table) minus already-visited (left-anti against the distance table)
become the next frontier at depth d+1. Terminates when the frontier is
empty or ``max_depth`` is hit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paragrapher_spark.plans.checkpoint import CheckpointManager
from paragrapher_spark.plans.metrics import ShuffleProbe


@dataclass
class BFSResult:
    distances: DataFrame  # (id, dist) — only reached vertices
    iterations: int
    exhausted: bool  # True if the frontier emptied before max_depth
    history: list[dict[str, Any]] = field(default_factory=list)


def bfs(
    edges: DataFrame,
    sources: DataFrame | list[int],
    max_depth: int = 50,
    directed: bool = True,
    num_partitions: int | None = None,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
) -> BFSResult:
    """BFS over edges(src, dst) from ``sources`` (a (id) DataFrame or a
    list of vertex ids). Returns hop distances for every reached vertex."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # sorted before caching — once frontiers outgrow the broadcast
    # threshold the frontier join is a SortMergeJoin; the cached order
    # spares the |E| side a re-sort every superstep (see pagerank.py)
    e = (
        e.distinct()
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e.count()

    if isinstance(sources, list):
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")
    else:
        src_df = sources.select("id")
    # duplicate seeds would survive into the result (depth-0 rows are not
    # deduplicated by the frontier logic below)
    src_df = src_df.distinct()

    start_iter = 0
    dist: DataFrame | None = None
    if checkpoint is not None:
        resumed = checkpoint.resume(spark)
        if resumed is not None:
            start_iter, dist = resumed
            dist = dist.repartition(n_part, "id").localCheckpoint(eager=True)
    if dist is None:
        dist = src_df.select("id", F.lit(0).cast("long").alias("dist"))
        dist = dist.repartition(n_part, "id").localCheckpoint(eager=True)

    # frontier = vertices at the current maximum depth (reconstructable
    # from the distance snapshot — that is what makes resume exact)
    frontier = dist.where(
        F.col("dist") == (dist.agg(F.max("dist")).collect()[0][0] or 0)
    ).select("id")
    frontier = frontier.localCheckpoint(eager=True)

    history: list[dict[str, Any]] = []
    exhausted = False
    probe = ShuffleProbe(spark)
    it = start_iter
    for it in range(start_iter + 1, max_depth + 1):
        t0 = time.monotonic()
        # ONE job per superstep (the PageRank discipline): the unioned
        # distance table is a non-eager localCheckpoint and the frontier-
        # size aggregation below is the single action that materializes it.
        # The next frontier is then a cheap filter over the checkpointed
        # partitions — no recompute, no second job.
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), on="src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, on="id", how="left_anti")
            .select("id", F.lit(it).cast("long").alias("dist"))
        )
        new_dist = (
            dist.unionByName(nxt)
            .repartition(n_part, "id")
            .localCheckpoint(eager=False)
        )
        frontier_size = (
            new_dist.agg(
                F.sum((F.col("dist") == it).cast("long")).alias("f")
            ).collect()[0]["f"]
            or 0
        )
        dt = time.monotonic() - t0
        shuffle_w, shuffle_r = probe.tick()
        metrics = {
            "frontier_size": frontier_size,
            "duration_s": dt,
            "shuffle_write_bytes": shuffle_w,
            "shuffle_read_bytes": shuffle_r,
        }
        history.append({"iteration": it, **metrics})
        if frontier_size == 0:
            exhausted = True
            it -= 1
            break
        dist = new_dist
        frontier = new_dist.where(F.col("dist") == it).select("id")
        if checkpoint is not None:
            if it % checkpoint_every == 0:
                checkpoint.save(it, dist, metrics)
            else:
                checkpoint.log_metrics(it, metrics)

    e.unpersist()
    if checkpoint is not None and exhausted:
        checkpoint.save(it + 1, dist, {"exhausted": True}, kind="final")
    return BFSResult(
        distances=dist, iterations=it, exhausted=exhausted, history=history
    )
