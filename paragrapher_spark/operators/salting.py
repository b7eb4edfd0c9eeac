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

from pyspark.sql import Column, DataFrame
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


def skew_report(
    df: DataFrame,
    key: str,
    n_partitions: int,
    k: int = 20,
) -> DataFrame:
    """(key, cnt, share_fp, fair_share, rec_salts): the ``k`` heaviest
    join keys with the salting prescription the PageRank kernel's
    ``n_salts="auto"`` applies (kernels/pagerank.py:146-156) — surfaced
    as a first-class diagnostic so skew is measured before it becomes a
    straggler, not after.

    Exact integers throughout: ``share_fp`` is the key's milli-share of
    all rows (ONE integer division), ``fair_share`` = max(1,
    rows // n_partitions) (what an even partitioning would hand each
    task), ``rec_salts`` = ceil(cnt / fair_share) when the key exceeds
    2x fair share, else 0 (not worth the replication) — the same
    threshold the kernel uses. One map-side-combinable count + a
    single-row total broadcast + a bounded top-k
    (TakeOrderedAndProject); ties break on the key."""
    cnts = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = cnts.agg(
        F.sum("cnt").cast("long").alias("__total")
    ).select(
        "__total",
        F.greatest(
            F.lit(1), F.expr(f"__total div {int(n_partitions)}")
        ).cast("long").alias("fair_share"),
    )
    return (
        cnts.crossJoin(F.broadcast(total))
        .select(
            key,
            "cnt",
            F.expr("(1000 * cnt) div __total").cast("long").alias("share_fp"),
            "fair_share",
            # ceil(cnt / fair_share) via (a+b-1) div b — positive-operand
            # form; a negate-divide-negate ceil would diverge between
            # Spark (div truncates toward zero) and DuckDB (// floors)
            F.when(
                F.col("cnt") > 2 * F.col("fair_share"),
                F.expr("(cnt + fair_share - 1) div fair_share"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rec_salts"),
        )
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# 2D grid (vertex-cut) edge partitioning — PowerGraph / GraphX EdgePartition2D
# ---------------------------------------------------------------------------


def _portable_hash(tag: str, seed: int, col: Column) -> Column:
    """Engine-portable uniform hash (the sources/corpus.py contract):
    first 15 md5 hex chars of 'tag:seed:value' parsed base-16. DuckDB
    twin: ('0x' || substr(md5('tag:seed:' || v::VARCHAR), 1, 15))::BIGINT
    — so every grid assignment below is exactly replayable by a SQL
    oracle."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(tag), F.lit(str(seed)), col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def grid_partition(
    edges: DataFrame, p: int, seed: int = 42, tag: str = "vc"
) -> DataFrame:
    """Assign each edge a block of the p x p 2D grid (the vertex-cut
    partitioning of Gonzalez et al., PowerGraph OSDI'12, as shipped in
    GraphX EdgePartition2D): row = H(src) mod p, col = H(dst) mod p,
    block = row*p + col.

    Why it matters at 10^12-file scale: hash-by-edge puts a power-law
    hub's adjacency in O(deg) partitions, and hash-by-src puts it in ONE
    (the skew problem the reference splits giant adjacencies for,
    `src/webgraph.c:957-971`). The 2D grid bounds every vertex's
    replication at 2p-1 blocks — one grid row plus one grid column —
    REGARDLESS of degree: replication grows with sqrt(P), not with the
    hub's fan-out. Pure JVM expressions, no shuffle (the block id is a
    map-side column; the exchange happens only when a consumer
    repartitions on it)."""
    if p < 1:
        raise ValueError(f"grid dimension p must be >= 1, got {p}")
    hs = F.pmod(_portable_hash(tag, seed, F.col("src")), F.lit(p))
    hd = F.pmod(_portable_hash(tag, seed, F.col("dst")), F.lit(p))
    return edges.withColumn("block", (hs * p + hd).cast("long"))


def vertex_cut_report(edges: DataFrame, p: int, seed: int = 42) -> DataFrame:
    """Compare the 2D grid vertex-cut against 1D hash-by-src on the SAME
    p*p block count: one row per scheme with exact-integer replication
    and balance metrics (every column gates under a SQL oracle).

    Columns: scheme, n_blocks, n_vertices, sum_replicas (Σ over vertices
    of #distinct blocks touching it — sum_replicas/n_vertices is the
    mean replication factor), max_replication, max_block_edges (load of
    the fullest block — the straggler bound).

    Scale shape: one map-side block assignment, an explode to (vertex,
    block) pairs, and two partial-aggregated groupBys — no join, no
    per-row Python; at 100 TB this is a single shuffle on vertex id."""
    g2 = grid_partition(edges, p, seed=seed)
    b1 = F.pmod(
        _portable_hash("vc", seed, F.col("src")), F.lit(int(p) * int(p))
    ).cast("long")
    g1 = edges.withColumn("block", b1)

    def _stats(g: DataFrame, scheme: str) -> DataFrame:
        vb = (
            g.select(F.col("src").alias("v"), "block")
            .unionByName(g.select(F.col("dst").alias("v"), "block"))
            .distinct()
        )
        repl = vb.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("r"))
        per_block = g.groupBy("block").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return (
            repl.agg(
                F.count(F.lit(1)).cast("long").alias("n_vertices"),
                F.sum("r").cast("long").alias("sum_replicas"),
                F.max("r").cast("long").alias("max_replication"),
            )
            .crossJoin(
                per_block.agg(F.max("c").cast("long").alias("max_block_edges"))
            )
            .select(
                F.lit(scheme).alias("scheme"),
                F.lit(int(p) * int(p)).cast("long").alias("n_blocks"),
                "n_vertices",
                "sum_replicas",
                "max_replication",
                "max_block_edges",
            )
        )

    return _stats(g2, "grid2d").unionByName(_stats(g1, "hash1d_src"))
