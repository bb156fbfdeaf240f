"""Watermarked windowed aggregations over an event stream.

Incremental re-expression of the reference's time-bucketed aggregates
(SURVEY.md §2.4-2.5) for unbounded input: tumbling / sliding event
counts per key with late-data handling via ``withWatermark``.

Scale notes: windowed streaming aggregation is hash-partitioned by
(key, window) into the state store — the same shuffle the batch groupBy
performs, amortized per micro-batch. The watermark bounds state size:
windows older than (max event time − delay) are finalized and evicted,
so state is O(keys × windows-in-flight), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_counts(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key event counts in non-overlapping time buckets.

    Works on both streaming and batch frames (same plan shape either
    way) — the batch form is the oracle for the streaming form in tests.
    """
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    window: str = "24 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key counts over overlapping windows — the incremental
    approximation of W1 (``transform_data.py:59-65``): the trailing-24h
    entity velocity, discretized to ``slide`` granularity. Each event
    lands in window/slide overlapping buckets (24 for 24h/1h); state per
    key is bounded by the watermark.

    For *exact* per-event trailing counts (no discretization) use
    :func:`fraud_detection_project_spark.streaming.velocity.streaming_velocity`.
    """
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
        )
    )


def session_event_counts(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key session aggregation with a dynamic-length session window
    (``F.session_window``): a session closes after ``gap`` of silence.
    State per (key, open session) only; the watermark finalizes and
    evicts closed sessions. Batch oracle:
    ``operators.windows.sessionize`` + groupBy(key, session_id).
    """
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
        )
    )
