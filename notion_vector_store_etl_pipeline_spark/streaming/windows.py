"""Structured Streaming windowed aggregation (SURVEY.md §2.10) — the
streaming twin of the batch `window_tumbling_counts` query. Watermark
bounds state: late events beyond the watermark are dropped rather than
growing unbounded state, which is what makes this viable on an
unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """events: a streaming DataFrame with (ts, event_type, value)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user SESSION windows on a stream: a session extends while
    events arrive within ``gap`` of the previous one and closes when
    the watermark passes the gap — the streaming twin of the batch
    `window_session_gap` / `session_window_native` queries. Session
    state is merged incrementally by the engine (sessions that touch
    merge), and the watermark is what lets closed sessions leave the
    state store.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
