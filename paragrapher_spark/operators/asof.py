"""Temporal joins the built-in operator set lacks: as-of join and
bounded range join, both planned as shuffled EQUI-joins (never a
cartesian / broadcast-nested-loop theta join).

The reference has no temporal operators (its data model is two dense
integer arrays, SURVEY.md §1.2); these belong to the training-data /
event-pipeline surface the brief adds on top. Both operators stay
whole-stage-codegen JVM expressions end to end.

Scale notes (the 100 TB shapes):

* ``asof_join`` — the classic implementation sorts both sides per key;
  expressed here as ONE union + ONE window, i.e. a single shuffle on the
  key and a per-key sort — exactly the plan a hand-written
  merge-as-of would need, but derived by Catalyst (WindowExec after one
  Exchange). No per-key collect, no range join. State per task is the
  running "last right row seen", O(1) per key.
* ``range_join`` — Spark plans ``l.ts BETWEEN r.ts - a AND r.ts + b``
  as BroadcastNestedLoopJoin (quadratic blow-up) unless one side fits in
  a broadcast. Bucketing both sides to ``width``-sized time buckets and
  equi-joining on (key, bucket) restores a shuffled hash/merge join:
  each left row probes at most ``ceil(span/width)+1`` buckets, so the
  fan-out is bounded by config, not data. AQE's skew-join split handles
  hot (key, bucket) cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _micros(col: Column) -> Column:
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the single LATEST
    right row of the same ``keys`` with ``right_ts <= left_ts`` (LEFT
    semantics — unmatched left rows keep nulls).

    Determinism: ties inside the right side (two right rows at the same
    timestamp for one key) are broken by the LAST ``right_cols`` column
    in ascending order, so callers should put a unique id there; a right
    row exactly at ``left_ts`` is eligible (<=, the pandas
    ``merge_asof(direction="backward")`` contract).

    ``tolerance_us``: matches further than this many microseconds in the
    past are nulled out (pandas ``tolerance``), applied AFTER the match
    so the plan is unchanged.

    Output: every left column, plus ``<right_ts><suffix>`` (epoch micros
    of the matched right row, long) and each requested right column as
    ``<name><suffix>``.

    Plan: union-tag both sides -> one Exchange on ``keys`` -> one
    WindowExec ordered by (t_us, side, tiebreak) computing
    ``last(payload, ignoreNulls)`` over rowsBetween(unboundedPreceding,
    currentRow) -> filter back to left rows. One shuffle total.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(
        _micros(F.col(right_ts)).alias("__t"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # Tie-break inside equal timestamps: ascending payload order makes
    # last() pick the max (t, side, tiebreak) — callers put a unique id
    # last in right_cols for a total order.
    tiebreak = (
        F.col("__payload").getField(right_cols[-1])
        if right_cols
        else F.lit(0)
    )
    rs = right.select(
        *[F.col(k) for k in keys],
        _micros(F.col(right_ts)).alias("__t_us"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
    )
    ls = left.select(
        *[F.col(k) for k in keys],
        _micros(F.col(left_ts)).alias("__t_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rs.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t_us", "__side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        rs.unionByName(ls)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_us is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__t_us") - F.col("__match.__t") <= F.lit(int(tolerance_us)),
                F.col("__match"),
            ),
        )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(c) for c in left.columns if c not in keys]
        + [F.col("__match.__t").alias(f"{right_ts}{suffix}")]
        + [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    )
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int = 0,
    width_us: int | None = None,
) -> DataFrame:
    """Bounded interval join: all (left, right) pairs sharing ``keys``
    with ``right_ts`` in ``[left_ts + lower_us, left_ts + upper_us]``
    (microsecond precision, both ends inclusive).

    Planned as an EQUI-join: both sides are assigned to time buckets of
    ``width_us`` (default: the window span, so each left row probes at
    most 2 buckets); the left side explodes to the bucket range its
    window overlaps via ``sequence()`` and the exact predicate is a
    post-join filter. Output keeps every column of both sides with the
    timestamps as epoch-micros longs (``t_us`` / ``t_us_r``).
    """
    if upper_us < lower_us:
        raise ValueError(f"empty range: [{lower_us}, {upper_us}]")
    span = upper_us - lower_us
    w = int(width_us or max(span, 1))
    lo, hi = F.lit(int(lower_us)), F.lit(int(upper_us))
    # Bucket ids via integer DIV, never float floor: at epoch-micros
    # magnitude a double quotient can land an ulp across an integer
    # boundary and disagree with an exact-arithmetic twin. DIV truncates
    # toward zero == floor for the non-negative post-epoch timestamps
    # this operator is documented for.
    ls = left.select(
        *[F.col(k) for k in keys],
        _micros(F.col(left_ts)).alias("t_us"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"(t_us + {int(lower_us)}) DIV {w}"),
                F.expr(f"(t_us + {int(upper_us)}) DIV {w}"),
            )
        ),
    )
    rs = right.select(
        *[F.col(k) for k in keys],
        _micros(F.col(right_ts)).alias("t_us_r"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in keys and c != right_ts
        ],
    ).withColumn("__bucket", F.expr(f"t_us_r DIV {w}"))
    joined = ls.join(rs, on=[*keys, "__bucket"]).where(
        (F.col("t_us_r") >= F.col("t_us") + lo)
        & (F.col("t_us_r") <= F.col("t_us") + hi)
    )
    return joined.drop("__bucket")
