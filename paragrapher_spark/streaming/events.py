"""Event-stream aggregation — batch/streaming-unified windowed counts.

The reference has NO event-time streaming: its "asynchronous" API is IO
overlap with callbacks (`doc/general_info.md:30-38`), so the engine's core
is iterative batch (SURVEY.md §2.5). This module is the one genuinely
streaming-shaped capability a training-data pipeline needs — incremental
event ingestion — expressed once as a DataFrame transform that works
identically on a batch frame and on a readStream frame (Structured
Streaming's unified-API contract):

- batch:     windowed_event_counts(spark.read.parquet(...))
- streaming: windowed_event_counts(readStream frame) + watermark -> sink

Late data: a 1-hour watermark bounds state; window = tumbling 1h on event
time. State stays per-(window, type) — tiny, no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value).

    Works on batch and streaming inputs alike; pass ``watermark`` (e.g.
    "1 hour") for streaming so Spark can expire window state.
    """
    # parquet event time often arrives as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP — normalize unconditionally so batch and stream plans agree
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events_hourly(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_hourly",
):
    """File-source streaming job: watch ``source_dir`` for parquet event
    files, maintain hourly windowed aggregates into an in-memory sink
    (swap for a parquet/kafka sink in production). Returns the
    StreamingQuery; caller awaits/stops it.

    Demonstrates the full streaming plumbing — schema-ful file source,
    watermark, stateful window agg, checkpointed sink — with availableNow
    semantics so tests process everything and stop deterministically.
    """
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
    )
    agg = windowed_event_counts(stream, watermark="1 hour")
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Sessionization — batch (gaps-and-islands) + custom stateful streaming
# ---------------------------------------------------------------------------


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value): split each
    user's event stream into sessions separated by > ``gap_minutes`` idle.

    Gaps-and-islands over a per-user window (partitioned by user_id — no
    global sort, scale-safe; deterministic order (ts, event_id)). The
    ANSI-SQL-expressible batch twin of ``sessionize_stream``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    # microsecond-integer gap arithmetic: exact, and bit-identical to the
    # DuckDB oracle's epoch_us (float epochs would disagree at boundaries)
    flagged = src.withColumn(
        "_new",
        (
            F.unix_micros(F.col("ts"))
            - F.coalesce(F.lag(F.unix_micros(F.col("ts"))).over(w), F.lit(0))
            > gap_minutes * 60 * 1_000_000
        ).cast("long"),
    ).withColumn("_sid", F.sum("_new").over(w))
    return (
        flagged.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_sid")
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user session state (start, last-seen, count, value sum) carried
    across micro-batches; a session is emitted when a later event arrives
    more than ``gap_minutes`` after the last one. The in-flight session
    stays in state (emitted on a subsequent batch that closes it).

    The one engine feature Structured Streaming's built-in windows can't
    express directly with per-group custom state — the reference has no
    analogue (its async API is IO overlap, not event-time state), but a
    training-data event pipeline needs it (SURVEY.md §2.5 note).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    state_schema = "start_us long, last_us long, n long, sv double"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = None, None, 0, 0.0
        closed = []
        for t, v in zip(ts_us, vals):
            if last_us is not None and t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, round(sv, 6)))
                start_us, n, sv = t, 0, 0.0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
            sv += v
        state.update((start_us, last_us, n, sv))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end", "n_events",
                    "sum_value",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how far does each user get through the
    ``steps`` sequence (e.g. signup -> view -> purchase)?

    Stage-1 time is the user's EARLIEST event of type ``steps[0]``; stage-k
    time is the earliest event of type ``steps[k-1]`` STRICTLY after the
    stage-(k-1) time (same-timestamp events do not advance the funnel —
    deterministic, documented tie rule). Returns one row per user who
    reached stage >= 1:

        (user_id, stage, t_first_ms, t_last_ms)

    with ``stage`` the deepest step index reached (1-based), ``t_first_ms``
    / ``t_last_ms`` the epoch-millis of the first / deepest stage events —
    all exact integers, so a DuckDB oracle gates every column.

    Plan shape: one type-filtered min-aggregation + one equi-join on the
    user key per step — len(steps) is pipeline config (a handful), each
    pass is a pushed-down filter + map-side-combinable min, state is one
    row per funnel user. No windows over the raw event stream, no UDF.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("t_ms"),
    )
    cur = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("t_ms").alias("t1"))
        .select("user_id", "t1", F.col("t1").alias("t_last"), F.lit(1).alias("stage"))
    )
    for k, step in enumerate(steps[1:], start=2):
        eligible = cur.where(F.col("stage") == k - 1).select(
            "user_id", F.col("t_last").alias("t_prev")
        )
        nxt = (
            ev.where(F.col("event_type") == step)
            .join(eligible, "user_id")
            .where(F.col("t_ms") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("t_ms").alias("t_k"))
        )
        cur = (
            cur.join(nxt, "user_id", "left")
            .select(
                "user_id",
                "t1",
                F.coalesce(F.col("t_k"), F.col("t_last")).alias("t_last"),
                F.when(F.col("t_k").isNotNull(), F.lit(k))
                .otherwise(F.col("stage"))
                .alias("stage"),
            )
        )
    return cur.select(
        F.col("user_id").cast("long"),
        F.col("stage").cast("long"),
        F.col("t1").cast("long").alias("t_first_ms"),
        F.col("t_last").cast("long").alias("t_last_ms"),
    )


# ---------------------------------------------------------------------------
# Stream-stream join — click/error attribution pairs
# ---------------------------------------------------------------------------


def attribution_pairs(
    clicks: DataFrame,
    errors: DataFrame,
    max_gap_minutes: int = 10,
    watermark: str | None = None,
) -> DataFrame:
    """(user_id, click_id, error_id, t_us, t_err_us, gap_us): same-user
    (click, error) pairs with the error STRICTLY after the click and
    within ``max_gap_minutes`` — the events_range_join semantics,
    expressed so the SAME transform runs as a batch join and as a
    Structured Streaming STREAM-STREAM inner join.

    Streaming contract: pass ``watermark`` and Spark bounds BOTH sides'
    buffered state from the time-range join predicate (each click can
    be evicted once the error-side watermark passes click_ts + gap; an
    inner stream-stream join emits each match immediately, no watermark
    wait). Batch: the same code plans as a plain join; the driver-gated
    events_range_join query pins the bucketed-equi-join variant of the
    identical semantics, and the batch==stream test pins this one.

    100 TB shape: the join key is user_id + the time range, so state and
    shuffle partition by user — power-law users (bot traffic) are the
    skew axis; the watermark caps state growth to gap-window x arrival
    rate per user."""
    c = clicks.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").cast("timestamp").alias("e_ts"),
        F.col("event_id").alias("error_id"),
    )
    if watermark is not None:
        c = c.withWatermark("c_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    joined = c.join(
        e,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (
            F.col("e_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "error_id",
        F.unix_micros(F.col("c_ts")).alias("t_us"),
        F.unix_micros(F.col("e_ts")).alias("t_err_us"),
        (F.unix_micros(F.col("e_ts")) - F.unix_micros(F.col("c_ts"))).alias(
            "gap_us"
        ),
    )


def stream_attribution_pairs(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "attribution_pairs",
    max_gap_minutes: int = 10,
):
    """File-source stream-stream join: two filtered branches of ONE
    parquet event stream joined on (user, time range) — the canonical
    Structured Streaming stream-stream inner join with watermarked
    state eviction on both sides, append output (matches emit as they
    happen). Returns the StreamingQuery (availableNow; caller awaits)."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    clicks = stream.where(F.col("event_type") == "click")
    errors = stream.where(F.col("event_type") == "error")
    pairs = attribution_pairs(
        clicks, errors, max_gap_minutes=max_gap_minutes, watermark="1 hour"
    )
    return (
        pairs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def last_click_attribution(
    events: DataFrame, max_gap_minutes: int = 10
) -> DataFrame:
    """(error_id, user_id, t_err_us, click_id, t_click_us, gap_us): each
    error attributed to the LATEST same-user click strictly before it
    within ``max_gap_minutes`` — the deduplicating marketing-attribution
    semantics on top of the pair join (ties on click time break on the
    higher click_id; unattributed errors are dropped). Batch-only: the
    argmax window needs the full candidate set per error; the streaming
    path keeps the raw pair feed and attributes downstream.

    Shape: the bounded pair join (Sum of per-user pair counts) + ONE
    row_number window partitioned by error_id — WindowGroupLimit keeps
    a single buffered row per error per task."""
    from pyspark.sql import Window

    clicks = events.where(F.col("event_type") == "click")
    errors = events.where(F.col("event_type") == "error")
    pairs = attribution_pairs(clicks, errors, max_gap_minutes=max_gap_minutes)
    w = Window.partitionBy("error_id").orderBy(
        F.desc("t_us"), F.desc("click_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "error_id",
            "user_id",
            "t_err_us",
            "click_id",
            F.col("t_us").alias("t_click_us"),
            "gap_us",
        )
    )


# ---------------------------------------------------------------------------
# Streaming stateful dedup — first-seen exact dedup over a document feed
# ---------------------------------------------------------------------------


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    watermark: str | None = None,
    ts_col: str = "ts",
):
    """Streaming twin of operators/dedup.dedup_exact: a parquet document
    feed deduplicated on content md5 with Spark's stateful
    ``dropDuplicates`` operator — the FIRST arrival of each content hash
    passes, every later duplicate is suppressed, across microbatches and
    restarts (the hash-seen state lives in the checkpoint, so a
    restarted query keeps suppressing what it already emitted — the
    batch keep-first policy becomes keep-first-ARRIVAL under event
    order). Sink is an append-mode parquet directory (``out_dir``) —
    the memory sink cannot recover a checkpoint, and the survivors of a
    dedup feed are exactly what a pipeline persists anyway.

    State: one row per distinct content hash, forever — the honest cost
    of exact streaming dedup. Pass ``watermark`` (with an event-time
    ``ts_col``) to switch to ``dropDuplicatesWithinWatermark``, which
    expires hash-state older than the watermark: bounded state, dedup
    guaranteed only within the watermark horizon (the 100 TB trade;
    near-dup pipes upstream of this make the same horizon call).
    Returns the StreamingQuery (availableNow; caller awaits)."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if watermark is not None:
        hashed = hashed.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, watermark)
        uniq = hashed.dropDuplicatesWithinWatermark(["content_hash"])
    else:
        uniq = hashed.dropDuplicates(["content_hash"])
    return (
        uniq.select(id_col, "content_hash")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_enriched_events(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    checkpoint_dir: str,
    query_name: str = "enriched_stream",
    key: str = "user_id",
):
    """Stream-static enrichment join: a parquet event stream joined with
    a STATIC dimension table on ``key`` — the third join class next to
    batch and stream-stream. The static side is planned per microbatch
    (broadcast when small), needs no watermark and holds no state; the
    stream side stays append-only. Returns the StreamingQuery (memory
    sink, availableNow)."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    joined = stream.join(F.broadcast(dim), on=key, how="inner")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Batch event analytics: cohort retention, Markov transitions, burst days
# ---------------------------------------------------------------------------

# Monday 1970-01-05 anchors the week index so weeks are ISO-style
# Mon..Sun; an integer week index (not a DATE) keeps every output column
# an exact long for the cross-engine gate.
_EPOCH_MONDAY_DAYS = 4  # days from 1970-01-01 (Thu) to 1970-01-05 (Mon)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — the canonical product-analytics rollup
    (the reference's client programs stop at graph descriptives; this is
    the events-table analogue of its degree-distribution battery,
    `test/test1_deg_dist_WG400.c`, over time instead of degree).

    Cohort of a user = week index of their FIRST event; a (cohort_week,
    week_offset) cell counts the cohort's users active offset weeks
    later. All columns are exact longs: week index = (epoch_days − 4)
    DIV 7 (Monday-anchored integer division — no timezone/DATE types in
    the gate surface).

    Plan shape (100 TB): one min-agg per user (map-side combinable), one
    equi-join back on the user key, one distinct-agg on (cohort, offset,
    user) collapsed into the final groupBy — two shuffles total, both on
    keys with event-table cardinality, no window over the raw stream.
    """
    # epoch days are positive for any ts >= 1970-01-05, so truncating DIV
    # and the oracle's flooring // agree; floor() keeps the IEEE division
    # exact regardless (operands < 2^53)
    wk = lambda c: F.floor((F.datediff(F.col(c).cast("date"), F.lit("1970-01-01")) - F.lit(_EPOCH_MONDAY_DAYS)) / 7).cast("long")  # noqa: E731
    ev = events.select(
        F.col(user_col).alias("user_id"),
        wk(ts_col).alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .select("user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("cohort_week").cast("long"), F.col("week_offset").cast("long"), "n_users")
    )


TRANSITION_FIXED_POINT = 1_000_000  # 1e-6 probability resolution


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types within each user's totally-ordered event stream (order key
    (ts, event_id) — the unique id breaks timestamp ties, so the
    successor of every event is deterministic).

    Returns (from_type, to_type, n, n_from, p_fp): exact transition
    count, exact row-total, and the transition probability in 1e-6
    fixed point via integer floor division — summation-order-free, so
    a DuckDB oracle gates every column bit-exactly.

    Plan shape: one window (lead over user partitions — a single
    shuffle on user_id, the same key sessionization uses) + one
    grouped count + one broadcast-sized self-agg join on from_type.
    State per task is one partition's rows; nothing driver-side.
    """
    w = Window.partitionBy("user_id").orderBy("t_ms", "eid")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("from_type"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("t_ms"),
        F.col(id_col).alias("eid"),
    )
    pairs = (
        ev.withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.col("n_from").cast("long"),
        F.expr(f"(n * {TRANSITION_FIXED_POINT}) DIV n_from").alias("p_fp"),
    )


def event_bursts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    factor: int = 3,
) -> DataFrame:
    """Burst-day detection: a user's day is a burst when its event count
    strictly exceeds ``factor`` × the user's MEDIAN daily count — an
    integer-only outlier rule (the float z-score alternative needs a
    stddev/sqrt and cannot gate bit-exactly; a median multiple is the
    robust-statistics standard anyway).

    Median = type-1 (lower) quantile: the ceil(n/2)-th smallest daily
    count, ties broken by day index — the same integer-rank selection
    contract as functions/stats.py. Returns (user_id, day_idx, n_events,
    median_n) for burst days only; day_idx = exact epoch-day long.

    Plan shape: per-(user, day) count (one shuffle), per-user median by
    row_number over a user-partitioned window (second shuffle, |users·
    days| rows), equi-join and filter. No driver-side work.
    """
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01")).cast("long").alias("day_idx"),
    )
    daily = ev.groupBy("user_id", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy("n_events", "day_idx")
    med = (
        daily.withColumn("rn", F.row_number().over(w))
        .withColumn("n_days", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .where(F.col("rn") == F.ceil(F.col("n_days") / 2))
        .select("user_id", F.col("n_events").alias("median_n"))
    )
    return (
        daily.join(med, "user_id")
        .where(F.col("n_events") > F.lit(factor) * F.col("median_n"))
        .select("user_id", "day_idx", "n_events", F.col("median_n").cast("long"))
    )
