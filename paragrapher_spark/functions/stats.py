"""Exact grouped order statistics.

The training-data use case: calibrating length/quality filter
thresholds ("drop docs under the per-language p10 length") needs real
quantiles, and approx_percentile's error bounds are not replayable in a
second engine. This operator computes EXACT type-1 quantiles (the value
at 0-based position floor((n-1)*q) of the sorted column — the lower
interpolation numpy calls ``method="lower"``) with the position derived
in ALL-INTEGER arithmetic, so a DuckDB oracle reproduces every output
bit-for-bit.

Scale: one shuffle on the group keys, one per-group sort inside
WindowExec — the exact-quantile floor. At 100 TB run it on a
deterministic sample (operators/sampling.py) or switch to
``approx_percentile`` when replayability is not required; the reference
has no order statistics at all (SURVEY.md §2.5).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_quantiles"]


def _qname(q: Fraction) -> str:
    pct = q * 100
    if pct.denominator == 1:
        return f"p{pct.numerator}"
    return f"p{float(pct):g}".replace(".", "_")


def group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    qs: tuple[float | str, ...] = ("0.5", "0.9", "0.99"),
) -> DataFrame:
    """Per-``keys`` exact quantiles of ``value_col``.

    Returns one row per group: the keys, ``n`` (long), ``v_min`` /
    ``v_max``, and one column per requested quantile (named ``p50``,
    ``p90``, ...) holding the exact sorted-position value.

    Quantile positions use integer arithmetic only: for q = num/den the
    selected 1-based rank is ``(n-1)*num DIV den + 1``. Pass qs as
    strings ("0.9") or floats; each is parsed as an exact Fraction, so
    no float multiply decides a boundary. Ties in ``value_col`` are
    harmless — row_number among equal values is arbitrary but the value
    AT a rank is the sorted multiset's, which is unique.
    """
    fracs = [Fraction(str(q)) for q in qs]
    for q in fracs:
        if not 0 <= q <= 1:
            raise ValueError(f"quantile out of range: {q}")
    w = Window.partitionBy(*keys).orderBy(value_col)
    wall = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        *[F.col(k) for k in keys],
        F.col(value_col).alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    aggs = [
        F.max("__n").cast("long").alias("n"),
        F.min("__v").alias("v_min"),
        F.max("__v").alias("v_max"),
    ]
    for q in fracs:
        pos = F.expr(f"((__n - 1) * {q.numerator}) DIV {q.denominator} + 1")
        aggs.append(F.max(F.when(F.col("__rn") == pos, F.col("__v"))).alias(_qname(q)))
    return ranked.groupBy(*keys).agg(*aggs)
