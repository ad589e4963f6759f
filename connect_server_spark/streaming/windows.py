"""Windowed aggregations over the events table (SURVEY §2.9 T6).

Each operator is written against a DataFrame that may be batch or
streaming: ``window``/``session_window`` behave identically, so the
DuckDB oracle gates the batch semantics while ``readStream`` + watermark
exercises the streaming path (see tests). Watermarks bound state for
late data; in batch they are a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_counts", "sliding_value_sums", "session_counts"]


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    width: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per event-type counts in tumbling windows."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_value_sums(
    events: DataFrame,
    ts_col: str = "event_ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding-window sums of ``value`` (integer cents for hash-stable
    cross-engine comparison)."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents")
        )
        .select(F.col("w.start").alias("window_start"), "value_cents")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    gap: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (gap-based): one row per session with its
    start and event count."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
