"""Windowed event aggregations — batch and streaming share one builder.

The reference has no streaming (mutations are synchronous RPCs); this is
§2.7's streaming row, built on Structured Streaming primitives:
``window()`` for tumbling/sliding, ``session_window()`` for gap-based
sessions, watermarks for late data.  The builders below take either a
batch or a streaming DataFrame — the plan is identical, which is how
Spark unifies the two (and how we test streaming semantics against the
batch oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_event_time_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """``withWatermark`` that tolerates TIMESTAMP_NTZ event time.

    Spark requires the watermark column to be TIMESTAMP (an instant,
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), but parquet naive
    timestamps arrive as TIMESTAMP_NTZ under Spark 4's NTZ inference —
    so cast first; the session timezone defines the instant, which is
    exactly the semantics a naive event log has."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, delay)


def tumbling_window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per (window, event_type): count + value sum.  With a watermark the
    same plan runs under readStream and emits finalized windows only."""
    df = events
    if watermark is not None and df.isStreaming:
        df = with_event_time_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    df = events
    if watermark is not None and df.isStreaming:
        df = with_event_time_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration, slide_duration))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key (native session_window — the
    stateful streaming shape; batch mode gives the same sessions as the
    lag/cumsum SQL in registry/relational.py rel_events_sessions)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = with_event_time_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
