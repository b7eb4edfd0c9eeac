"""Strongly connected components — iterative coloring (forward–backward).

The directed completion of the components family: ``kernels/components.py``
answers "connected ignoring direction" (Jayanti–Tarjan WCC over the
co-purchase graph); this kernel answers "mutually reachable" over DIRECTED
link graphs — for the north-rule import graph that is exactly *cyclic
import detection*: an SCC of size > 1 is a set of source files whose
imports form a cycle. The reference has no SCC client (its bundled
workloads are degree/WCC/converters, `test/test2_wcc_WG800.c`), but SCC is
the canonical directed-graph analytic of a link-graph engine (WebGraph's
own dataset pages publish SCC counts for every crawl).

Algorithm: Orzan's coloring method (the standard distributed SCC used by
Pregel-likes; published in Orzan's 2004 thesis and the "On Identifying
Strongly Connected Components in Parallel" FW-BW literature):

repeat until no vertices remain:
  1. FORWARD coloring to fixpoint: color(v) = min id over {v} ∪ ancestors
     (propagate min color along edge direction u→v);
  2. roots = {v : color(v) == v};
  3. BACKWARD sweep within color: mark v when v reaches its root along
     forward edges THROUGH vertices of the same color (propagate "marked"
     against edge direction, guarded by color equality). color(v) == r
     means r →* v; the sweep certifies v →* r; both ⇒ v ∈ SCC(r);
  4. emit marked vertices with scc = their color; delete them and their
     incident edges; repeat on the remainder.

Every inner step is a join + min-aggregation on the vertex key — the WCC
discipline. Each outer round settles at least every current root (the
global min id is always one), and in practice hub-dominated graphs settle
in a handful of rounds; ``max_rounds`` bounds the loop with an explicit
``converged`` flag, mirroring kernels/kcore.py.

100 TB shape: state is one (id, color, marked) table shuffled on id; the
forward/backward propagations are the same map-side-combinable min-agg
joins as WCC (kernels/components.py:104-180) and reuse one persisted,
pre-partitioned edge table. No driver-side vertex state; per-round driver
traffic is two O(1) scalars. Worst case (one long path) degrades to O(V)
rounds like every label-propagation SCC — the documented trade against
Tarjan's inherently sequential stack.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paragrapher_spark.plans.metrics import ShuffleProbe


@dataclass
class SCCResult:
    components: DataFrame  # (id, scc) — scc = min vertex id of the component
    rounds: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def _min_propagate(
    labels: DataFrame, edges: DataFrame, n_part: int, max_iter: int = 200
) -> DataFrame:
    """Fixpoint of label(v) = min(label(v), min label over in-neighbors),
    propagating along edge direction src→dst. labels: (id, lab)."""
    cur = labels.repartition(n_part, "id").localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        cand = (
            edges.join(cur.select(F.col("id").alias("src"), "lab"), on="src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lab").alias("clab"))
        )
        nxt = (
            cur.join(cand, on="id", how="left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("clab", "lab")).alias("lab"),
                (F.col("clab") < F.col("lab")).cast("int").alias("chg"),
            )
            .repartition(n_part, "id")
            .localCheckpoint(eager=False)
        )
        changed = nxt.agg(F.sum("chg").alias("n")).collect()[0]["n"] or 0
        cur = nxt.select("id", "lab")
        if changed == 0:
            break
    if changed != 0:
        # an unconverged coloring would MISLABEL components — fail loudly
        # (the repo's malformed-input standard) instead of returning wrong
        # answers; max_iter bounds the diameter, not the correctness
        raise RuntimeError(
            f"scc coloring did not reach fixpoint in {max_iter} propagation "
            f"steps ({changed} labels still improving); raise max_iter"
        )
    return cur


def scc(
    edges: DataFrame,
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> SCCResult:
    """SCC labels for every vertex of directed edges(src, dst).

    Returns (id, scc) where ``scc`` is the smallest vertex id in the
    component — exactly the value a mutual-reachability oracle computes,
    so a DuckDB recursive-CTE transitive closure verifies this end to end
    at test scale.
    """
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    live = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_part, "src")
        .persist()
    )
    verts = (
        live.select(F.col("src").alias("id"))
        .unionByName(live.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(n_part, "id")
        .localCheckpoint(eager=True)
    )
    remaining = verts.count()

    done: DataFrame | None = None
    history: list[dict[str, Any]] = []
    probe = ShuffleProbe(spark)
    converged = False
    rnd = 0
    while remaining > 0 and rnd < max_rounds:
        rnd += 1
        t0 = time.monotonic()
        # 1. forward min-coloring: color(v) = min id reaching v (incl. v)
        colors = _min_propagate(
            verts.select("id", F.col("id").alias("lab")), live, n_part
        ).withColumnRenamed("lab", "color")

        # 2+3. backward sweep from roots, guarded by color equality:
        # marked(v) ⇔ v reaches its root within its color class
        ec = (
            live.join(colors.select(F.col("id").alias("src"), "color"), on="src")
            .join(
                colors.select(
                    F.col("id").alias("dst"), F.col("color").alias("dcolor")
                ),
                on="dst",
            )
            .where(F.col("color") == F.col("dcolor"))
            .select("src", "dst")
            .repartition(n_part, "dst")
            .persist()
        )
        marked = (
            colors.where(F.col("id") == F.col("color"))
            .select("id")
            .localCheckpoint(eager=True)
        )
        frontier = marked
        for _ in range(200):
            step = (
                ec.join(frontier.select(F.col("id").alias("dst")), on="dst")
                .select(F.col("src").alias("id"))
                .distinct()
                .join(marked, on="id", how="left_anti")
                .repartition(n_part, "id")
                .localCheckpoint(eager=False)
            )
            n_new = step.count()
            if n_new == 0:
                break
            marked = marked.unionByName(step).localCheckpoint(eager=False)
            frontier = step
        ec.unpersist()

        settled = (
            colors.join(marked, on="id")
            .select("id", F.col("color").alias("scc"))
            .localCheckpoint(eager=True)
        )
        n_settled = settled.count()
        done = settled if done is None else done.unionByName(settled)

        # 4. shrink the live graph to unsettled vertices
        verts = (
            verts.join(settled.select("id"), on="id", how="left_anti")
            .repartition(n_part, "id")
            .localCheckpoint(eager=True)
        )
        remaining = verts.count()
        if remaining > 0:
            nxt_live = (
                live.join(settled.select(F.col("id").alias("src")), on="src", how="left_anti")
                .join(settled.select(F.col("id").alias("dst")), on="dst", how="left_anti")
                .repartition(n_part, "src")
                .persist()
            )
            nxt_live.count()
            live.unpersist()
            live = nxt_live
        dt = time.monotonic() - t0
        shuffle_w, shuffle_r = probe.tick()
        history.append(
            {
                "round": rnd,
                "settled": n_settled,
                "remaining": remaining,
                "duration_s": dt,
                "shuffle_write_bytes": shuffle_w,
                "shuffle_read_bytes": shuffle_r,
            }
        )
    live.unpersist()
    converged = remaining == 0

    spark_empty = spark.createDataFrame([], "id long, scc long")
    components = done if done is not None else spark_empty
    return SCCResult(
        components=components.select(
            F.col("id").cast("long"), F.col("scc").cast("long")
        ),
        rounds=rnd,
        converged=converged,
        history=history,
    )


def condensation(edges: DataFrame, components: DataFrame) -> DataFrame:
    """Quotient (condensation) DAG of a directed graph given its SCC
    labeling: one vertex per component, a distinct edge c1→c2 wherever
    any original edge crosses the two components. Acyclic by the SCC
    definition — the canonical reduction that turns cyclic-import
    analysis into topological-order questions (build scheduling,
    layering). Two equi-joins + distinct; both joins broadcast when the
    component table is small, shuffle otherwise.
    """
    c = components.select("id", "scc")
    return (
        edges.select("src", "dst")
        .join(
            c.select(F.col("id").alias("src"), F.col("scc").alias("csrc")),
            on="src",
        )
        .join(
            c.select(F.col("id").alias("dst"), F.col("scc").alias("cdst")),
            on="dst",
        )
        .where(F.col("csrc") != F.col("cdst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .distinct()
    )
