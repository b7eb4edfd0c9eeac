"""k-core: iterative peeling to the maximal subgraph of min-degree >= k.

Standard link-graph robustness analytic (not a reference client, same
extension family as PageRank/LP in the north rule's kernel set). Peeling is
the canonical dataflow formulation: repeatedly drop vertices whose degree
in the CURRENT subgraph is < k until a fixpoint; what survives is the
k-core. Each round is one degree aggregation + two semi-joins over the
shrinking edge set — map-side-combinable, no driver-side vertex state,
localCheckpoint bounds lineage (single-action-per-round discipline: the
surviving-EDGE count materializes the non-eager checkpoint and doubles as
the fixpoint detector — peeling strictly decreases the edge count until
the vertex set is stable).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paragrapher_spark.plans.iterstate import StateCheckpointer


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id) — members of the k-core
    edges: DataFrame  # (src, dst) — induced undirected edges, src < dst
    rounds: int
    history: list[dict[str, Any]] = field(default_factory=list)


def kcore(edges: DataFrame, k: int, max_rounds: int = 100) -> KCoreResult:
    """k-core of the undirected simple graph underlying edges(src, dst)."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    history: list[dict[str, Any]] = []
    prev_m: int | None = None
    rnd = 0
    state_ckpt = StateCheckpointer(edges.sparkSession)
    for rnd in range(1, max_rounds + 1):
        t0 = time.monotonic()
        deg = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id")
        # ONE action per round (the PageRank discipline): the filtered edge
        # set rides a non-eager localCheckpoint materialized by the count
        # below. Fixpoint detection on EDGE count — removing any vertex
        # removes >= 1 of its incident edges, so the edge count strictly
        # decreases until (and exactly until) the vertex set is stable.
        e = (
            e.join(keep.withColumnRenamed("id", "src"), on="src", how="left_semi")
            .join(keep.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
            .transform(state_ckpt.cut_lazy)
        )
        m = e.count()
        history.append(
            {"round": rnd, "edges": m, "duration_s": time.monotonic() - t0}
        )
        if prev_m is not None and m == prev_m:
            break
        prev_m = m
        if m == 0:
            break
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # pin both escapes + reclaim round-trip files now
    verts, e = state_ckpt.pin(verts, e)
    return KCoreResult(vertices=verts, edges=e, rounds=rnd, history=history)
