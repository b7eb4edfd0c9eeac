"""paragrapher_spark — a from-scratch, PySpark-native link-graph analytics
engine with the query/data-processing capabilities of ParaGrapher
(reference: MohsenKoohi/ParaGrapher, surveyed in SURVEY.md).

The reference is a parallel graph *loader* (WebGraph/BVGraph decompression
streamed to callbacks, `include/paragrapher.h`) plus bundled analytics
clients (degree distribution `test/test1_deg_dist_WG400.c`, Jayanti-Tarjan
WCC `test/test2_jtcc_WG400.c`, format converters `test/test3..8*.c`).

This engine re-expresses that surface Spark-first:

- canonical COO edge table ``DataFrame[src: long, dst: long, weight: long]``
  (the reference's CSX arrays map to degree/offset tables, SURVEY.md §1.4);
- iterative kernels (PageRank, large-star/small-star connected components,
  label propagation, exact triangle counting) as DataFrame joins +
  aggregations with explicit skew handling;
- resumable supersteps through a parquet+JSON checkpoint manifest
  (the reference's buffer state machine, `src/webgraph.c:29-35`, reified);
- training-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) over document/embedding tables.
"""

from paragrapher_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
