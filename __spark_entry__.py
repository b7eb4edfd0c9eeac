"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank to 1e-6 convergence on the part
co-purchase graph derived from sf0.001 (the BASELINE.json metric's query
shape: iterative PageRank over a derived edge table).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, checked against DuckDB at sf0.01. Graph queries run over the
co-purchase edge table (sources/edges.py) so the oracle stays ANSI-SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paragrapher_spark.kernels.degrees import degree_distribution, top_k_degrees
from paragrapher_spark.kernels.pagerank import pagerank
from paragrapher_spark.operators.indexing import prefix_sum
from paragrapher_spark.sources.edges import (
    COPURCHASE_EDGES_SQL,
    CUSTOMER_ORDER_EDGES_SQL,
    copurchase_edges,
    customer_order_edges,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    edges = copurchase_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(edges, tol=1e-6, max_iter=50)
    return res.ranks.select("id", "rank")


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_in_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    return degree_distribution(edges, direction="in").select(
        F.col("degree").cast("long").alias("degree"),
        F.col("frequency").cast("long").alias("frequency"),
    )


def _q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = customer_order_edges(spark, sf_dir)
    return top_k_degrees(edges, k=20, direction="out").select(
        F.col("id").cast("long").alias("id"),
        F.col("out_degree").cast("long").alias("out_degree"),
    )


def _q_csr_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = customer_order_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    out = prefix_sum(deg, ["id"], "out_degree", out_col="offset", num_partitions=8)
    return out.select(
        F.col("id").cast("long"),
        F.col("out_degree").cast("long"),
        F.col("offset").cast("long"),
    )


def _q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    res = pagerank(edges, tol=1e-6, max_iter=60)
    return res.ranks.select("id", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "in_degree_dist": _q_in_degree_dist,
        "degree_topk": _q_degree_topk,
        "csr_offsets": _q_csr_offsets,
        "pagerank_copurchase": _q_pagerank_copurchase,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "in_degree_dist": f"""
            WITH edges AS ({COPURCHASE_EDGES_SQL}),
            indeg AS (
                SELECT dst, CAST(count(*) AS BIGINT) AS degree
                FROM edges GROUP BY dst
            )
            SELECT degree, CAST(count(*) AS BIGINT) AS frequency
            FROM indeg GROUP BY degree
        """,
        "degree_topk": f"""
            WITH edges AS ({CUSTOMER_ORDER_EDGES_SQL})
            SELECT CAST(src AS BIGINT) AS id,
                   CAST(count(*) AS BIGINT) AS out_degree
            FROM edges GROUP BY src
            ORDER BY out_degree DESC, id ASC
            LIMIT 20
        """,
        "csr_offsets": f"""
            WITH edges AS ({CUSTOMER_ORDER_EDGES_SQL}),
            deg AS (
                SELECT src AS id, CAST(count(*) AS BIGINT) AS out_degree
                FROM edges GROUP BY src
            )
            SELECT id, out_degree,
                   CAST(COALESCE(
                       SUM(out_degree) OVER (
                           ORDER BY id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS offset
            FROM deg
        """,
        # pagerank_copurchase: iterative, not ANSI-SQL-expressible ->
        # rows-only check; exact-match correctness is covered by the numpy
        # power-iteration oracle in tests/test_pagerank.py.
    }
