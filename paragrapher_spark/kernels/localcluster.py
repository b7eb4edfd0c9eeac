"""Local clustering: the PPR sweep cut (Andersen–Chung–Lang).

"Local graph partitioning using PageRank vectors" (Andersen, Chung, Lang,
FOCS 2006): rank vertices by degree-normalized personalized-PageRank mass
from a seed, then sweep prefixes of that order and return the prefix with
the best conductance — the canonical local-community extractor around a
query vertex, and the natural composition of two kernels this repo already
gates (ppr_batch × the conductance arithmetic of labelprop.py).

Exactness contract: the PPR vector is ppr_batch's 1e-12 fixed point; the
sweep order key is the integer (ppr_fp·ratio_scale) DIV deg (exact
rational-compare surrogate, ties to the smaller id — a pairwise
cross-multiplication comparator cannot be expressed as a SQL sort key, a
floored quotient can); prefix volume and internal-edge counts are exact
longs via cumulative window sums; conductance is ranked by the integer
phi_fp = (cut·1e9) DIV denom, so the argmin prefix is engine-exact (a
float phi column would make the argmin a double comparison).

Scale shape: the sweep runs over the SEED'S SUPPORT — the set of vertices
the truncated PPR actually reaches — which is the whole point of ACL
locality: support ≪ |V| for short walks on huge graphs. The two window
scans over the ranked support are single-partition by construction and
documented as such (support-sized, not |V|-sized); everything upstream
(PPR rounds, degree join, max-rank edge bucketing) is ordinary shuffled
relational work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paragrapher_spark.kernels.pagerank import ppr_batch

SWEEP_PHI_SCALE = 1_000_000_000  # 1e-9 conductance resolution


def ppr_sweep_cut(
    edges: DataFrame,
    seed: int,
    rounds: int = 6,
    ratio_scale: int = 1000,
) -> DataFrame:
    """Sweep-cut over canonical undirected edges(src, dst) (src < dst,
    simple). Returns one row per support prefix with vol·2 ≤ 2m (the
    classical half-volume sweep range):

        (rank, id, ppr_fp, vol, cut, phi_fp, is_best)

    all exact longs; ``is_best`` marks the minimal-phi_fp prefix (ties →
    smallest rank) — the ACL local community around ``seed``."""
    e = edges.select("src", "dst").distinct()
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    two_m = und.count()

    ppr = ppr_batch(und, seeds=[seed], rounds=rounds).select("id", "ppr_fp")
    ranked = (
        ppr.join(deg, "id")
        .select(
            "id",
            "deg",
            "ppr_fp",
            F.expr(f"(ppr_fp * {ratio_scale}) DIV deg").alias("q"),
        )
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("q"), "id")).cast("long"),
        )
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    vols = ranked.select(
        "rank", "id", "ppr_fp", F.sum("deg").over(w_cum).cast("long").alias("vol")
    )
    # internal edges of prefix k = edges whose BOTH endpoints rank <= k:
    # bucket each edge at max(rank_src, rank_dst), cumulative-sum buckets
    ra = ranked.select(F.col("id").alias("src"), F.col("rank").alias("r_s"))
    rb = ranked.select(F.col("id").alias("dst"), F.col("rank").alias("r_d"))
    mr = (
        e.join(ra, "src")
        .join(rb, "dst")
        .select(F.greatest("r_s", "r_d").alias("mr"))
        .groupBy("mr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    swept = (
        vols.join(mr, vols.rank == mr.mr, "left")
        .select(
            "rank",
            "id",
            "ppr_fp",
            "vol",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .withColumn("internal", F.sum("c").over(w_cum).cast("long"))
        .where(F.col("vol") * 2 <= F.lit(two_m))
        .select(
            "rank",
            "id",
            "ppr_fp",
            "vol",
            (F.col("vol") - 2 * F.col("internal")).cast("long").alias("cut"),
        )
        .withColumn(
            "phi_fp",
            F.expr(
                f"(cut * {SWEEP_PHI_SCALE}) DIV least(vol, {two_m} - vol)"
            ).cast("long"),
        )
    )
    best_rank = (
        swept.join(
            F.broadcast(swept.agg(F.min("phi_fp").alias("best_phi"))),
            swept.phi_fp == F.col("best_phi"),
        )
        .agg(F.min("rank").alias("best_rank"))
    )
    return swept.crossJoin(F.broadcast(best_rank)).select(
        "rank",
        "id",
        "ppr_fp",
        "vol",
        "cut",
        "phi_fp",
        (F.col("rank") == F.col("best_rank")).alias("is_best"),
    )
