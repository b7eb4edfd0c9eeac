"""Graph assembly: corpus -> vertices + canonical COO edge table.

Spark-native equivalent of `paragrapher_open_graph` +
`paragrapher_csx_get_offsets` (`src/paragrapher.c:69-82,109-123`): the
"graph handle" is a pair of DataFrames plus cached metadata counts
(the reference parses |V|/|E| from the `.properties` file,
`src/webgraph.c:376-387`; here they are computed once and carried).

- ``vertices(id: long, repo: string, path: string)`` — dense ids minted by
  global key rank (operators.indexing.dense_ids; the reference's ID space
  is dense by construction, SURVEY.md §1.4).
- ``edges(src: long, dst: long, weight: long)`` — deduplicated, weight =
  number of import sites.
- ``degrees`` / ``offsets`` — the CSR offsets analogue
  (`src/WG400AP.java:198-296`) as a prefix-sum table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paragrapher_spark.functions.extract import extract_import_keys, vertex_key
from paragrapher_spark.operators.indexing import dense_ids, prefix_sum


@dataclass
class Graph:
    """The engine's graph handle (reference: `paragrapher_graph`,
    `include/paragrapher.h:21`)."""

    vertices: DataFrame  # id, repo, path
    edges: DataFrame  # src, dst, weight
    num_vertices: int
    num_edges: int
    #: lazily-built global (src, dst, eid) edge index for row-range scans —
    #: computed once per handle and reused (the reference mmaps its offsets
    #: array once per graph, `src/webgraph.c:614-615`); Engine.scan_edges_rows
    #: populates it.
    edge_index: DataFrame | None = field(default=None, repr=False, compare=False)
    #: memoized offsets table (same mmap-once economics: the prefix sum
    #: runs once per handle even when offsets are consulted repeatedly —
    #: csr writes, adjacency writes, engine get_offsets).
    _offsets: DataFrame | None = field(default=None, repr=False, compare=False)

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_degree")
        )

    def offsets(self) -> DataFrame:
        """CSR offsets: offset[v] = edges before v's adjacency, covering all
        vertices (degree 0 included), ending such that the last vertex's
        offset + degree == |E| (`src/WG400AP.java:255` invariant).
        Memoized per handle — prefix_sum returns a materialized table, so
        repeat callers reuse it instead of re-running the two-phase sum."""
        if self._offsets is None:
            deg = (
                self.vertices.select("id")
                .join(self.out_degrees(), on="id", how="left")
                .select(
                    "id", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
                )
            )
            self._offsets = prefix_sum(deg, ["id"], "out_degree", out_col="offset")
        return self._offsets


def edges_from_corpus(corpus: DataFrame, num_partitions: int | None = None) -> Graph:
    """Extract the import graph from a corpus table.

    Unresolved imports (no matching (repo, path) row) are dropped via the
    inner join against the vertex table — the corpus generator produces
    only resolvable targets, and the tests assert zero loss.
    """
    vertices = dense_ids(
        corpus.select("repo", "path"), ["repo", "path"], id_col="id",
        num_partitions=num_partitions,
    )
    vkeys = vertices.select(
        vertex_key(F.col("repo"), F.col("path")).alias("key"), "id"
    )
    sites = extract_import_keys(corpus)
    src_map = vkeys.select(F.col("key").alias("src_key"), F.col("id").alias("src"))
    dst_map = vkeys.select(F.col("key").alias("dst_key"), F.col("id").alias("dst"))
    edges = (
        sites.join(src_map, on="src_key")
        .join(dst_map, on="dst_key")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    n_v = vertices.count()
    edges = edges.persist()
    n_e = edges.count()
    return Graph(vertices=vertices, edges=edges, num_vertices=n_v, num_edges=n_e)


def call_graph_from_corpus(corpus: DataFrame, num_partitions: int | None = None) -> Graph:
    """Extract the FUNCTION-level call graph from a corpus table — the
    finer-granularity companion to ``edges_from_corpus``'s file-level
    import graph (the reference analyzes one graph per dataset; multi-
    granularity over the same corpus is engine surface it lacks).

    Vertices are all defined functions (dense ids by global fname rank,
    isolated functions included); edges are (caller, callee) with weight
    = number of call sites. Self-loops (recursion) are preserved — a call
    graph is cyclic, unlike the parity-layered import fixture.
    """
    from paragrapher_spark.functions.extract import (
        extract_call_sites,
        extract_functions,
    )

    funcs = extract_functions(corpus)
    vertices = dense_ids(
        funcs.select("fname"), ["fname"], id_col="id",
        num_partitions=num_partitions,
    )
    sites = extract_call_sites(corpus)
    src_map = vertices.select(F.col("fname").alias("caller"), F.col("id").alias("src"))
    dst_map = vertices.select(F.col("fname").alias("callee"), F.col("id").alias("dst"))
    edges = (
        sites.join(src_map, on="caller")
        .join(dst_map, on="callee")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    n_v = vertices.count()
    edges = edges.persist()
    n_e = edges.count()
    return Graph(vertices=vertices, edges=edges, num_vertices=n_v, num_edges=n_e)


def graph_from_edges(edges: DataFrame, weight: bool = False) -> Graph:
    """Wrap a raw (src, dst[, weight]) edge table as a Graph; vertices are
    the distinct endpoint ids (no name attributes)."""
    if not weight:
        edges = edges.select("src", "dst").withColumn("weight", F.lit(1).cast("long"))
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("repo", F.lit(None).cast("string"))
        .withColumn("path", F.lit(None).cast("string"))
    )
    edges = edges.persist()
    n_e = edges.count()
    n_v = vertices.count()
    return Graph(vertices=vertices, edges=edges, num_vertices=n_v, num_edges=n_e)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: edges ∪ reversed edges, distinct (paper §5 dataset
    prep; needed by CC/LP/triangles)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def quotient_graph(
    edges: DataFrame,
    mapping: DataFrame,
    weight_col: str | None = None,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Coarsen ``edges(src, dst[, weight])`` by a vertex→group ``mapping
    (id, group)``: one edge per ordered group pair, ``weight`` = the number
    of underlying edges (or the exact sum of ``weight_col`` when given).
    The attribute-quotient twin of ``kernels.scc.condensation`` (which
    quotients by computed SCC labels): rolling a file-level import graph up
    to package/repo dependency edges, a user graph up to region edges — the
    coarsening step every multilevel partitioner and graph summary starts
    with. Weights stay exact longs; no floats anywhere.

    Scale shape (100 TB): two equi-joins of the edge table against the
    (small) mapping — broadcast when the vertex table fits, shuffled
    hash join otherwise — then one map-side-combinable agg whose key
    cardinality is #groups², usually tiny. Vertices missing from
    ``mapping`` drop out via the inner joins (loud alternative: pre-check
    with an anti-join; the import-graph callers generate total mappings).
    """
    w = (
        F.sum(F.col(weight_col)).cast("long")
        if weight_col
        else F.count(F.lit(1)).cast("long")
    )
    e = edges.join(
        mapping.select(F.col("id").alias("src"), F.col("group").alias("gsrc")),
        on="src",
    ).join(
        mapping.select(F.col("id").alias("dst"), F.col("group").alias("gdst")),
        on="dst",
    )
    if drop_self_loops:
        e = e.where(F.col("gsrc") != F.col("gdst"))
    return e.groupBy(
        F.col("gsrc").alias("src_group"), F.col("gdst").alias("dst_group")
    ).agg(w.alias("weight"))


def bipartite_project(
    edges: DataFrame,
    cap: int = 1000,
    metrics: dict | None = None,
) -> DataFrame:
    """Co-reference projection of a directed ``edges(src, dst)`` table:
    one row per unordered source pair (a < b) that references at least
    one common dst, ``weight`` = the exact number of distinct shared
    dsts. The co-citation / co-import / users-who-bought-together shape
    (Small 1973) — the projection every bipartite recommender and
    shared-dependency analysis starts from.

    Scale contract: a dst referenced by d sources fans out to d·(d-1)/2
    pairs, so hub dsts are the quadratic blow-up. dsts with in-degree >
    ``cap`` are EXCLUDED and counted (``metrics["n_dropped_dsts"]`` /
    ``["n_dropped_refs"]`` — the minhash dropped-bucket discipline:
    never a silent drop, never an unbounded wedge join). Plan: dedupe
    arcs (one shuffle), in-degree agg + filter, self-equi-join on dst,
    map-side-combinable pair count. No per-row Python anywhere.
    """
    arcs = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    indeg = arcs.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    if metrics is not None:
        drop = (
            indeg.where(F.col("d") > cap)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("d"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        metrics["n_dropped_dsts"] = int(drop["n"])
        metrics["n_dropped_refs"] = int(drop["r"])
    keep = arcs.join(
        indeg.where(F.col("d") <= cap).select("dst"), on="dst", how="left_semi"
    )
    a = keep.select(F.col("dst"), F.col("src").alias("a"))
    b = keep.select(F.col("dst"), F.col("src").alias("b"))
    return (
        a.join(b, on="dst")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
