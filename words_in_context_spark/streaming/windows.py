"""Event-time streaming aggregations (ST coverage beyond the reference).

The reference has no event-time semantics; a web-scale ingest pipeline does.
These are thin, tested wrappers over Structured Streaming's watermark +
window machinery, with memory-sink helpers for synchronous draining in tests
(``availableNow`` + ``processAllAvailable``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with late-data
    handling. Works on both batch and streaming DataFrames (same plan)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return src.groupBy(win.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization via session_window (the batch twin is the
    lag/cumsum variant in driver_queries_pipeline.q_sessionize)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "user_id",
        "n_events",
        "sum_value",
    )


def drain_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test helper: run a streaming DF to completion into a memory sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
