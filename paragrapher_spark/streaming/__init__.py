from paragrapher_spark.streaming.events import stream_events_hourly, windowed_event_counts

__all__ = ["windowed_event_counts", "stream_events_hourly"]
