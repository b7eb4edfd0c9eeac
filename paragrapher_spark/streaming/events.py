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

from pyspark.sql import DataFrame, SparkSession
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
