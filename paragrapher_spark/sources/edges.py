"""Edge-table sources over the driver's parquet testdata.

The reference consumes pre-built graph files; here graphs are *derived*
from relational tables (the Spark-native analogue of its format converters,
`test/test3..6*.c`). Two canonical derivations over
``/root/testdata/sf*/``:

- ``copurchase_edges``: undirected part co-purchase graph from ``lineitem``
  (parts appearing in the same order), oriented ``src < dst``. Non-bipartite
  (has triangles), power-law-ish — the workhorse graph for kernel queries.
- ``customer_order_edges``: directed bipartite customer->order graph for
  degree/offset queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src, dst) with src < dst, distinct: parts sharing an order.

    Self-join on l_orderkey: a shuffle-hash/sort-merge join on the order
    key; order sizes are bounded (few lineitems per order) so the join
    fans out mildly and AQE handles any residual skew.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def copurchase_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src, dst, weight) with src < dst: weight = number of
    co-occurring LINEITEM PAIRS (an order that lists a part on k lineitems
    contributes k pairs with each other part — co-occurrence strength, not
    a distinct-order count) — the arc-labelled (weighted) derivation of
    the co-purchase graph (the reference's WG404 weighted-arc capability,
    `src/WG404AP.java:171-182`, expressed as a relational aggregation).
    The DuckDB oracle (COPURCHASE_WEIGHTED_EDGES_SQL) mirrors the same
    definition."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def customer_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bipartite edges customer -> order."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst"))
        .distinct()
    )


def replicate_edges(edges: DataFrame, k: int) -> DataFrame:
    """k disconnected, structurally identical copies of the graph:
    vertex v of copy r becomes ``v*k + r``. Deterministic (no randomness),
    preserves degree distribution and component structure per copy.

    Purpose: scale per-superstep work for scaling-efficiency measurements
    (the sandbox stand-in for the reference paper's 16->128-core runs,
    §5.6) without external data — the same job must saturate both
    parallelism levels, else fixed scheduling overhead masquerades as
    poor scaling.
    """
    if k <= 1:
        return edges
    reps = edges.sparkSession.range(k).select(F.col("id").alias("_rep"))
    return edges.crossJoin(F.broadcast(reps)).select(
        (F.col("src") * k + F.col("_rep")).alias("src"),
        (F.col("dst") * k + F.col("_rep")).alias("dst"),
    )


COPURCHASE_EDGES_SQL = """
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
"""

CUSTOMER_ORDER_EDGES_SQL = """
    SELECT DISTINCT o_custkey AS src, o_orderkey AS dst FROM orders
"""

COPURCHASE_WEIGHTED_EDGES_SQL = """
    SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS weight
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
"""
