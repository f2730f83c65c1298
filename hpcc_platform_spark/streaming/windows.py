"""Streaming windowed aggregation helpers.

These accept either a batch or streaming DataFrame (the transformations are
identical — Structured Streaming's design point); tests drive them with a
file source + memory sink (processAllAvailable) for deterministic local
verification, the Kafka source swaps in transparently at deploy time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts+sums with a watermark for late data.

    Watermark bounds state: events later than ``watermark`` behind the max
    seen timestamp are dropped and their windows finalized — the knob that
    keeps state finite on an unbounded stream.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_len).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per user — F.session_window, the
    streaming-native form of the batch sessionize query (q_window)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("sess"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            user_col,
            "n_events",
            "session_value",
        )
    )
