from paragrapher_spark.streaming.events import (
    stream_events_hourly,
    windowed_event_counts,
)
from paragrapher_spark.streaming.graph_stream import (
    incremental_degrees,
    stream_degrees,
)

__all__ = [
    "windowed_event_counts",
    "stream_events_hourly",
    "incremental_degrees",
    "stream_degrees",
]
