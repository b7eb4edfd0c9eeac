"""Data-layout operators — Morton (Z-order) clustering for
two-dimensional scan pruning.

The 100 TB problem this solves: parquet min/max pruning only skips a
file/row-group when the FILTER column's range inside it is narrow. A
layout sorted by one column gives perfect pruning on that column and
NONE on any other — every file spans the other column's full range. A
Z-order layout (interleave the bits of two columns, sort by the result
— Morton 1966; the Delta Lake / Iceberg `ZORDER BY` technique) makes
BOTH columns' per-file ranges narrow at once (each file covers a quad
of the 2-D key space), so predicates on either column, or both, prune.

The engine-parity angle: the reference's WebGraph substrate leans on
locality-preserving vertex orders for compression and scan locality
(BVGraph copy-lists reference NEARBY vertices); Z-ordering an edge
table by (src, dst) is the relational image of that trick — edge blocks
become 2-D tiles, so a subgraph read on a vertex range prunes on both
endpoints (`paragrapher_csx_get_subgraph` semantics,
`src/webgraph.c:1036-1091`, served by file skipping instead of offset
arithmetic).

Everything here is pure JVM Column expressions (an unrolled
shift/mask/or tree — whole-stage codegen folds it into straight-line
long arithmetic); the z-value is an exact integer, so the DuckDB oracle
replays it bit for bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per dimension: 21+21 = 42-bit z-values, ids to ~2.1e6.
#: Raise to 31 (62-bit z) for planet-scale id spaces.
DEFAULT_BITS = 21


def zvalue(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value of two non-negative longs: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1. Inputs past ``bits`` bits raise
    loudly (a silent mask would alias far-apart keys into one tile)."""
    guard = F.when(
        (x < 0) | (y < 0) | (x >= F.lit(1 << bits)) | (y >= F.lit(1 << bits)),
        F.raise_error(
            F.format_string(
                f"zvalue: inputs must be in [0, 2^{bits}); got (%s, %s)",
                x.cast("string"),
                y.cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    parts = [guard]
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).cast("long")


def zvalue_sql(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """The DuckDB twin of :func:`zvalue` (same unrolled shift/mask/or
    tree), for oracle SQL generation."""
    xb = f"CAST({x} AS BIGINT)"
    yb = f"CAST({y} AS BIGINT)"
    parts = []
    for i in range(bits):
        parts.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = DEFAULT_BITS,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Morton order of
    ``cols``: compute the z-value, range-partition on it (equal-size
    tiles via sampled range bounds — the same balancing
    repartitionByRange gives every sorted writer here), sort within
    partitions, and drop the helper column on write. Readers filtering
    on EITHER of ``cols`` (or both) now prune files/row-groups by
    parquet min/max stats; no reader-side cooperation needed.

    Scale shape: one range-exchange + per-partition sort — identical
    cost to a plain sorted write; the pruning benefit is free at read
    time forever after (the write-once/scan-many trade every 100 TB
    table makes)."""
    spark = df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    x, y = cols
    (
        df.withColumn("__z", zvalue(F.col(x), F.col(y), bits))
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
