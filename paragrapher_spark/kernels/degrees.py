"""Degree kernels — the reference's test1 workload.

`test/test1_deg_dist_WG400.c` computes in-degrees with per-edge atomic
increments during the scan (line 59) and then a histogram of the histogram
(lines 227-257). Both collapse to hash aggregations with map-side partial
aggregation — exactly the partial-then-final pattern the reference
hand-rolls (per-buffer atomics, then a global pass at test1:233-243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def in_degrees(edges: DataFrame) -> DataFrame:
    """(id, in_degree) — `test1:59`'s atomic in_degrees[dst]++."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree) — offsets[v+1]-offsets[v] (`test1:158-161`)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def degree_distribution(edges: DataFrame, direction: str = "in") -> DataFrame:
    """(degree, frequency) histogram — `test1:227-257`.

    Two chained hash aggs; the second groups by degree value, whose
    cardinality is tiny (max degree), so the final shuffle is negligible
    at any scale.
    """
    deg = in_degrees(edges) if direction == "in" else out_degrees(edges)
    col = "in_degree" if direction == "in" else "out_degree"
    return (
        deg.groupBy(F.col(col).alias("degree"))
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def top_k_degrees(edges: DataFrame, k: int = 10, direction: str = "in") -> DataFrame:
    """Top-k vertices by degree — the reference's max-degree scan
    (`test1:233-237`) generalized. orderBy().limit() lets Spark run a
    per-partition top-k (TakeOrderedAndProject), no full sort."""
    deg = in_degrees(edges) if direction == "in" else out_degrees(edges)
    col = "in_degree" if direction == "in" else "out_degree"
    return deg.orderBy(F.col(col).desc(), F.col("id").asc()).limit(k)
