"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank to 1e-6 convergence on the part
co-purchase graph derived from sf0.001 (the BASELINE.json metric's query
shape: iterative PageRank over a derived edge table).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators, checked against
DuckDB at sf0.01. Graph queries run over the co-purchase / customer-order
edge tables (sources/edges.py) so oracles stay ANSI-SQL; iterative kernels
that SQL cannot express (PageRank, label propagation) and hash-defined
operators (MinHash/SimHash/LSH) are rows-only here and exact-oracle-tested
in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paragrapher_spark.functions.text import detect_language, fingerprint, text_stats
from paragrapher_spark.graph import edges_from_corpus
from paragrapher_spark.kernels.bfs import bfs
from paragrapher_spark.kernels.components import component_sizes, connected_components
from paragrapher_spark.kernels.degrees import degree_distribution, top_k_degrees
from paragrapher_spark.kernels.labelprop import label_propagation
from paragrapher_spark.kernels.pagerank import pagerank
from paragrapher_spark.kernels.kcore import kcore
from paragrapher_spark.kernels.triangles import (
    clustering_coefficient,
    triangle_count,
    triangles_per_vertex,
)
from paragrapher_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dup_groups,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from paragrapher_spark.operators.multimodal import media_stats, synth_media
from paragrapher_spark.operators.indexing import prefix_sum
from paragrapher_spark.operators.similarity import knn_bruteforce, knn_ivf, knn_lsh
from paragrapher_spark.sources.corpus import synth_corpus
from paragrapher_spark.sources.edges import (
    COPURCHASE_EDGES_SQL,
    CUSTOMER_ORDER_EDGES_SQL,
    copurchase_edges,
    customer_order_edges,
    load_table,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    edges = copurchase_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(edges, tol=1e-6, max_iter=50)
    return res.ranks.select("id", "rank")


# ---------------------------------------------------------------------------
# graph kernel queries
# ---------------------------------------------------------------------------


def _q_graph_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|V|, |E|, max/avg degrees of the co-purchase graph — the reference's
    GET_VERTICES_COUNT / GET_EDGES_COUNT metadata options
    (`src/webgraph.c:456-462`) plus the degree extremes its test1 prints."""
    edges = copurchase_edges(spark, sf_dir)
    deg_out = edges.groupBy("src").count()
    deg_in = edges.groupBy("dst").count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return (
        verts.agg(F.count(F.lit(1)).alias("vertices"))
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("edges")))
        .crossJoin(deg_out.agg(F.max("count").alias("max_out_degree")))
        .crossJoin(deg_in.agg(F.max("count").alias("max_in_degree")))
        .select(
            F.col("vertices").cast("long"),
            F.col("edges").cast("long"),
            F.col("max_out_degree").cast("long"),
            F.col("max_in_degree").cast("long"),
            F.round(
                F.col("edges").cast("double") / F.col("vertices").cast("double"), 6
            ).alias("avg_degree"),
        )
    )


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


def _q_wcc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    res = connected_components(edges)
    return res.components.select(
        F.col("id").cast("long"), F.col("component").cast("long")
    )


def _q_wcc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    res = connected_components(edges)
    return component_sizes(res.components).select(
        F.col("component").cast("long"), F.col("size").cast("long")
    )


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    return triangle_count(edges).select(F.col("triangles").cast("long"))


def _q_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected hop distances from the smallest vertex id, capped at 6
    hops — frontier-superstep BFS vs the DuckDB recursive-CTE oracle."""
    edges = copurchase_edges(spark, sf_dir)
    src = edges.agg(F.min(F.least("src", "dst"))).collect()[0][0]
    res = bfs(edges, [int(src)], directed=False, max_depth=6)
    return res.distances.select(
        F.col("id").cast("long"), F.col("dist").cast("long")
    )


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    return triangles_per_vertex(edges).select(
        F.col("id").cast("long"), F.col("triangles").cast("long")
    )


def _q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    return clustering_coefficient(edges).select(
        F.col("id").cast("long"),
        F.col("degree").cast("long"),
        F.col("triangles").cast("long"),
        "coeff",
    )


def _q_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices of the 64-core of the co-purchase graph (iterative peeling
    => rows-only; python-oracle-tested in tests/test_kcore_clustering.py).
    k=64 sits just above the graph's min degree at these SFs, so the peel
    actually cascades before stabilizing."""
    edges = copurchase_edges(spark, sf_dir)
    return kcore(edges, k=64).vertices.select(F.col("id").cast("long"))


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    res = label_propagation(edges, max_iter=10)
    return res.labels.select(F.col("id").cast("long"), F.col("label").cast("long"))


def _q_import_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule pipeline end-to-end: synthetic source-code corpus ->
    vectorized import extraction -> dense-id edge table -> PageRank.
    Hash-generated corpus => no ANSI-SQL oracle; exactness is covered by
    tests/test_corpus_extract.py + tests/test_pagerank.py."""
    corpus = synth_corpus(spark, n_files=2000, n_repos=8)
    g = edges_from_corpus(corpus, num_partitions=8)
    res = pagerank(g.edges, vertices=g.vertices, tol=1e-6, max_iter=60)
    return res.ranks.select("id", "rank")


def _q_import_graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted variant: rank flows proportionally to import-site counts
    (edge weight) — the reference's WG404 arc-labelled capability
    (`src/WG404AP.java:171-182`). Rows-only; weighted oracle in
    tests/test_pagerank.py::test_weighted_pagerank."""
    corpus = synth_corpus(spark, n_files=2000, n_repos=8)
    g = edges_from_corpus(corpus, num_partitions=8)
    res = pagerank(
        g.edges, vertices=g.vertices, tol=1e-6, max_iter=60, weight_col="weight"
    )
    return res.ranks.select("id", "rank")


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings / events)
# ---------------------------------------------------------------------------


def _q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at the 10 smallest vertex ids —
    restart + dangling mass return to the seed set. Iterative fixpoint =>
    rows-only; numpy oracle in tests/test_pagerank.py."""
    edges = copurchase_edges(spark, sf_dir)
    seeds = [r[0] for r in edges.select(F.least("src", "dst")).distinct().orderBy(F.least("src", "dst")).limit(10).collect()]
    res = pagerank(edges, tol=1e-6, max_iter=60, teleport=seeds)
    return res.ranks.select("id", "rank")


def _q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs).select(
        "content_hash",
        F.col("n_docs").cast("long"),
        F.col("rep_id").cast("long"),
    )


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text_stats(docs)


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(detect_language(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, num_hashes=64, bands=16, threshold=0.35
    ).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "est_jaccard"
    )


def _q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidates(docs, max_hamming=8).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.col("hamming").cast("long"),
    )


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.2).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.4, method="exact").select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "score"
    )


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprints (order-sensitive content ids —
    the reference's converter checksum, test3:303). Mod-2^61 Horner over
    utf-8 bytes is not ANSI-SQL-expressible (int64 overflow) => rows-only;
    exactness tested in tests/test_dedup_text.py."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select(F.col("doc_id").cast("long"), "fingerprint")


def _q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over opaque binary columns + typed metadata
    (deterministic synthetic media; decode is a seeded fake — the image/
    audio libs are stubbed, the Spark schema/partitioning/UDF batching is
    real). No parquet media table in testdata => rows-only."""
    media = synth_media(spark, n=200)
    return media_stats(media)


def _q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 50)
    return knn_bruteforce(emb, queries=probes, k=5).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "score",
    )


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_lsh(emb, k=5, n_bits=16, bands=8).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "score",
    )


def _q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paragrapher_spark.streaming.events import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30).select(
        F.col("user_id").cast("long"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long"),
        "sum_value",
    )


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-indexed approximate all-pairs top-k (coarse k-means quantizer +
    probed buckets) — the scale path beside knn_lsh. Approximate by
    construction => rows-only; recall vs brute force pinned in
    tests/test_similarity_multimodal.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivf(emb, k=5, n_centroids=16, n_probe=4).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "score",
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_meta": _q_graph_meta,
        "in_degree_dist": _q_in_degree_dist,
        "degree_topk": _q_degree_topk,
        "csr_offsets": _q_csr_offsets,
        "pagerank_copurchase": _q_pagerank_copurchase,
        "wcc_labels": _q_wcc_labels,
        "wcc_sizes": _q_wcc_sizes,
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "bfs_depths": _q_bfs_depths,
        "clustering_coeff": _q_clustering_coeff,
        "kcore_members": _q_kcore_members,
        "label_propagation": _q_label_propagation,
        "import_graph_pagerank": _q_import_graph_pagerank,
        "import_graph_pagerank_weighted": _q_import_graph_pagerank_weighted,
        "pagerank_personalized": _q_pagerank_personalized,
        "exact_dup_groups": _q_exact_dup_groups,
        "text_stats": _q_text_stats,
        "language_id": _q_language_id,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash_near_dups": _q_simhash_near_dups,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_dups": _q_embedding_dups,
        "doc_fingerprint": _q_doc_fingerprint,
        "media_stats": _q_media_stats,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "events_hourly": _q_events_hourly,
        "sessions": _q_sessions,
    }


_WCC_CTE = f"""
    WITH RECURSIVE edges AS ({COPURCHASE_EDGES_SQL}),
    und AS (
        SELECT src AS a, dst AS b FROM edges
        UNION
        SELECT dst AS a, src AS b FROM edges
    ),
    verts AS (SELECT DISTINCT a AS v FROM und),
    reach(v, r) AS (
        SELECT v, v FROM verts
        UNION
        SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.v
    ),
    comp AS (SELECT v AS id, MIN(r) AS component FROM reach GROUP BY v)
"""

_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"


def oracle_sql() -> dict[str, str]:
    return {
        "graph_meta": f"""
            WITH edges AS ({COPURCHASE_EDGES_SQL}),
            verts AS (
                SELECT src AS id FROM edges UNION SELECT dst FROM edges
            ),
            m AS (
                SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) AS vertices,
                       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS edges,
                       (SELECT CAST(MAX(c) AS BIGINT) FROM (
                           SELECT count(*) AS c FROM edges GROUP BY src)) AS max_out_degree,
                       (SELECT CAST(MAX(c) AS BIGINT) FROM (
                           SELECT count(*) AS c FROM edges GROUP BY dst)) AS max_in_degree
            )
            SELECT vertices, edges, max_out_degree, max_in_degree,
                   ROUND(CAST(edges AS DOUBLE) / CAST(vertices AS DOUBLE), 6)
                       AS avg_degree
            FROM m
        """,
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
        "wcc_labels": _WCC_CTE
        + "SELECT CAST(id AS BIGINT) AS id, CAST(component AS BIGINT) AS component FROM comp",
        "wcc_sizes": _WCC_CTE
        + """
            SELECT CAST(component AS BIGINT) AS component,
                   CAST(count(*) AS BIGINT) AS size
            FROM comp GROUP BY component
        """,
        "triangle_count": f"""
            WITH edges AS ({COPURCHASE_EDGES_SQL}),
            und AS (
                SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM edges WHERE src <> dst
                GROUP BY 1, 2
            )
            SELECT CAST(count(*) AS BIGINT) AS triangles
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        """,
        "bfs_depths": f"""
            WITH RECURSIVE e AS ({COPURCHASE_EDGES_SQL}),
            und AS (
                SELECT src, dst FROM e
                UNION
                SELECT dst AS src, src AS dst FROM e
            ),
            walk(id, dist) AS (
                SELECT (SELECT MIN(LEAST(src, dst)) FROM e), 0
                UNION
                SELECT u.dst, walk.dist + 1
                FROM walk JOIN und u ON u.src = walk.id
                WHERE walk.dist < 6
            )
            SELECT CAST(id AS BIGINT) AS id,
                   CAST(MIN(dist) AS BIGINT) AS dist
            FROM walk GROUP BY id
        """,
        "triangles_per_vertex": f"""
            WITH edges AS ({COPURCHASE_EDGES_SQL}),
            und AS (
                SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM edges WHERE src <> dst
                GROUP BY 1, 2
            ),
            tri AS (
                SELECT e1.a AS u, e1.b AS v, e2.b AS w
                FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            members AS (
                SELECT u AS id FROM tri
                UNION ALL SELECT v FROM tri
                UNION ALL SELECT w FROM tri
            )
            SELECT CAST(id AS BIGINT) AS id,
                   CAST(count(*) AS BIGINT) AS triangles
            FROM members GROUP BY id
        """,
        "clustering_coeff": f"""
            WITH edges AS ({COPURCHASE_EDGES_SQL}),
            und AS (
                SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM edges WHERE src <> dst
                GROUP BY 1, 2
            ),
            deg AS (
                SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
                    SELECT a AS id FROM und UNION ALL SELECT b FROM und
                ) GROUP BY id
            ),
            tri AS (
                SELECT e1.a AS u, e1.b AS v, e2.b AS w
                FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            tcount AS (
                SELECT id, CAST(count(*) AS BIGINT) AS t FROM (
                    SELECT u AS id FROM tri
                    UNION ALL SELECT v FROM tri
                    UNION ALL SELECT w FROM tri
                ) GROUP BY id
            )
            SELECT CAST(d.id AS BIGINT) AS id, d.degree,
                   CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles,
                   ROUND(2.0 * COALESCE(t.t, 0) / (d.degree * (d.degree - 1)), 6)
                       AS coeff
            FROM deg d LEFT JOIN tcount t ON t.id = d.id
            WHERE d.degree >= 2
        """,
        "exact_dup_groups": """
            SELECT md5(text) AS content_hash,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(doc_id) AS BIGINT) AS rep_id
            FROM documents GROUP BY md5(text)
        """,
        "text_stats": f"""
            WITH t AS (
                SELECT doc_id, text, {_TOKENS} AS toks FROM documents
            ),
            s AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CASE WHEN len(toks) > 0 THEN
                           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END AS atl,
                       CASE WHEN length(text) > 0 THEN
                           CAST(length(text) - length(translate(text, '.,;:!?', '')) AS DOUBLE)
                           / CAST(length(text) AS DOUBLE)
                       ELSE 0.0 END AS pr,
                       CASE WHEN len(toks) > 0 THEN
                           1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END AS rr
                FROM t
            )
            SELECT doc_id, n_tokens, n_chars,
                   ROUND(atl, 6) AS avg_token_len,
                   ROUND(pr, 6) AS punct_ratio,
                   ROUND(rr, 6) AS repetition_ratio,
                   ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * (1.0 - pr) * (1.0 - rr), 6)
                       AS quality_score
            FROM s
        """,
        "ngram_jaccard": f"""
            WITH t AS (
                SELECT doc_id, {_TOKENS} AS toks FROM documents
            ),
            g AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 3 THEN
                           list_distinct(list_transform(
                               range(1, len(toks) - 1),
                               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                       ELSE [array_to_string(toks, ' ')] END AS grams
                FROM t
            ),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            c AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
            sh AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(count(*) AS DOUBLE) AS shared
                FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   ROUND(shared / (ca.n + cb.n - shared), 6) AS jaccard
            FROM sh
            JOIN c ca ON ca.doc_id = sh.id_a
            JOIN c cb ON cb.doc_id = sh.id_b
            WHERE shared / (ca.n + cb.n - shared) >= 0.2
        """,
        "embedding_dups": """
            WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            s AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
                FROM v a JOIN v b ON a.vec_id < b.vec_id
            )
            SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   score
            FROM s WHERE score >= 0.4
        """,
        "knn_bruteforce": """
            WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            s AS (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       list_cosine_similarity(a.e, b.e) AS sc
                FROM v a JOIN v b ON a.vec_id <> b.vec_id
                WHERE a.vec_id < 50
            ),
            r AS (
                SELECT query_id, neighbor_id, sc,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY sc DESC, neighbor_id
                       ) AS rn
                FROM s
            )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(neighbor_id AS BIGINT) AS neighbor_id,
                   ROUND(sc, 6) AS score
            FROM r WHERE rn <= 5
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessions": """
            WITH o AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN epoch_us(ts) - COALESCE(
                               epoch_us(lag(ts) OVER (
                                   PARTITION BY user_id ORDER BY ts, event_id
                               )), 0) > 30 * 60 * 1000000
                            THEN 1 ELSE 0 END AS nw
                FROM events
            ),
            s AS (
                SELECT *, SUM(nw) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING
                ) AS sid
                FROM o
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        # rows-only (not ANSI-SQL-expressible / hash-defined):
        #   pagerank_copurchase, import_graph_pagerank  (iterative float fixpoint)
        #   label_propagation                           (iterative, tie-break state)
        #   minhash_near_dups, simhash_near_dups, knn_lsh (hash-function-defined)
        #   language_id                                 (lexicon heuristic; exact-
        #       match tested in tests/test_dedup_text.py::test_language_id)
    }
