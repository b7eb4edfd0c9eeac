"""Grouped HyperLogLog distinct-count sketches — exact-replayable.

`kernels/hyperball.py` already carries a deterministic 16-register HLL
whose every bit a DuckDB oracle reproduces (md5-prefix hash family,
exact-BIGINT estimator denominator, literal ln() correction table). This
module lifts that machinery out of the graph kernel into the general
relational shape a training-data pipeline needs: approximate
COUNT(DISTINCT value) per group — vocabulary size per language, unique
users per source, shingle cardinality per shard — in ONE map-side-
combinable aggregation.

Scale shape (100 TB): per input row, one md5 + register/rho expressions
(pure JVM); per group, 16 conditional MAX aggregations — partial maxes
combine map-side, so the shuffle carries #groups x 16 ints no matter how
many rows flow in. The estimator is the shared `ball_estimate` column
expression (same literals as the kernel), so estimates are deterministic
and bit-identical across engines — an HLL sketch that sits under the
exact-hash correctness gate, like `hyperball_balls`.

Accuracy is the standard HLL m=16 envelope (~26% relative error, 1.04/√m)
— the register count mirrors the reference-companion HyperBall setup the
kernel pins; widen M in hyperball.py to trade memory for accuracy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paragrapher_spark.kernels.hyperball import (
    M,
    REG_COLS,
    RHO_CAP,
    ball_estimate,
)


def _value_hash(value: Column, tag: str, seed: int) -> Column:
    """60-bit md5-prefix hash of the value (the engine-portable family)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(tag), F.lit(str(seed)), value.cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    tag: str = "hll",
    seed: int = 42,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """(group_cols..., approx_distinct): deterministic HLL estimate of
    COUNT(DISTINCT value) per group. One aggregation; the per-group state
    is 16 small ints regardless of input size."""
    v = F.col(value) if isinstance(value, str) else value
    h = _value_hash(v, tag, seed)
    reg = F.pmod(h, F.lit(M))
    rest = F.shiftright(h, 4)
    tz = F.bit_count((rest.bitwiseAND(-rest)) - F.lit(1))
    rho = F.when(rest == 0, F.lit(RHO_CAP)).otherwise(
        F.least(tz + F.lit(1), F.lit(RHO_CAP))
    )
    regs = df.select(
        *group_cols,
        *[
            F.when(reg == i, rho).otherwise(F.lit(0)).cast("int").alias(c)
            for i, c in enumerate(REG_COLS)
        ],
    )
    merged = regs.groupBy(*group_cols).agg(
        *[F.max(c).alias(c) for c in REG_COLS]
    )
    return merged.select(
        *group_cols, F.round(ball_estimate(), 6).alias(out_col)
    )
