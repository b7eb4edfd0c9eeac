"""Distributed dense indexing & prefix sums — O(#partitions) driver work.

The reference materializes a CSR offsets array as the prefix sum of
out-degrees: parallel per-range degree scan, then a *sequential* prefix sum
(`src/WG400AP.java:198-296`, prefix sum at 237-252). Its paper (§5.6) shows
that sequential phase capping scaling at ~0.475 efficiency. Here the prefix
sum is two-phase and driver work is O(#partitions), never O(V):

1. range-partition + sort by key (global total order across partitions),
2. one tiny job collects per-partition counts/sums (#partitions rows),
3. the driver cumsums those (cheap) and broadcasts the per-partition bases,
4. a mapInPandas pass assigns ``base + local cumulative`` per row.

This pattern backs both dense vertex-ID minting (the reference's u32/u64 ID
spaces are dense by construction; arbitrary string keys here,
SURVEY.md §1.4) and the offsets table (`paragrapher_csx_get_offsets`,
`src/webgraph.c:601-711`).

A plain ``Window.orderBy(...)`` running sum would funnel all rows through a
single task — correct at sf0.01, dead at 100 TB. These helpers are the
scale-safe substitute and the tests pin their equivalence to the window
formulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partition_bases(sorted_df: DataFrame, agg_col: F.Column) -> dict[int, int]:
    """Collect per-partition totals and return exclusive running bases.

    One job over the persisted, range-partitioned input; returns
    {partition_id: sum of agg over all earlier partitions}. Driver cost is
    O(#partitions).
    """
    rows = (
        sorted_df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(agg_col.alias("total"))
        .collect()
    )
    totals = {r["pid"]: r["total"] for r in rows}
    bases: dict[int, int] = {}
    running = 0
    for pid in sorted(totals):
        bases[pid] = running
        running += totals[pid]
    return bases


def dense_ids(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense 0..N-1 ids to distinct keys, ordered by ``key_cols``.

    The id equals the key's rank in the global key order, so the result is
    deterministic regardless of where range-partition boundaries fall.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = (
        df.select(*key_cols)
        .distinct()
        .repartitionByRange(n, *key_cols)
        .sortWithinPartitions(*key_cols)
        .persist()
    )
    try:
        bases = _partition_bases(keys, F.count(F.lit(1)))
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in keys.schema.fields
        ) + f", {id_col} long"

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            base = bases.get(TaskContext.get().partitionId(), 0)
            seen = 0
            for pdf in batches:
                pdf = pdf.copy()
                pdf[id_col] = range(base + seen, base + seen + len(pdf))
                seen += len(pdf)
                yield pdf

        out = keys.mapInPandas(assign, schema=out_schema)
        # materialize before unpersist so callers get a stable result
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        keys.unpersist()


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "offset",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_cols`` order.

    ``exclusive=True`` gives the CSR offsets convention: offset[v] = number
    of edges before v's adjacency (`src/WG400AP.java:237-252`).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    try:
        bases = _partition_bases(sorted_df, F.sum(value_col).cast("long"))
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in sorted_df.schema.fields
        ) + f", {out_col} long"

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            running = bases.get(TaskContext.get().partitionId(), 0)
            for pdf in batches:
                pdf = pdf.copy()
                csum = pdf[value_col].cumsum()
                if exclusive:
                    pdf[out_col] = running + csum - pdf[value_col]
                else:
                    pdf[out_col] = running + csum
                running += int(pdf[value_col].sum())
                yield pdf

        out = sorted_df.mapInPandas(assign, schema=out_schema)
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        sorted_df.unpersist()
