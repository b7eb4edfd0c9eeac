"""Skew handling: hash-based salting for power-law join keys.

The reference's edge-balanced partitioner splits a single giant adjacency
across multiple buffers (`src/webgraph.c:957-971`) — vertex-aligned
partitioning would put twitter-2010's 3M-degree hubs in one buffer. The
Spark analogue on joins: a hot key's rows are split into ``n_salts``
sub-keys on the big (edge) side, and the small (vertex attribute) side is
replicated once per salt. Salt is hash-based (deterministic), never
``rand()`` — resumed/retried tasks must produce identical rows
(SURVEY.md §7 hard point (d)).

AQE's skew-join handles *shuffle-partition* level skew; explicit salting is
still the right tool when one key alone exceeds a partition (hub vertices
at 10^12-file scale), so both are used: AQE on by default (session.py),
salting opt-in per kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from the full row.

    Uses xxhash64 over all columns so the same logical row always lands in
    the same salt bucket (idempotent under task retry), while rows sharing
    a hot key spread uniformly.
    """
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def explode_salts(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the small/broadcast side)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Join big⋈small on ``key`` with the hot-key salt trick.

    big gets a per-row deterministic salt; small is replicated n_salts
    times; the join key becomes (key, salt). Output drops the salt column.
    Use when a single key's row count exceeds what one task should hold —
    the PageRank contribution join on hub vertices, for example.
    """
    b = salt_column(big, key, n_salts)
    s = explode_salts(small, n_salts)
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
