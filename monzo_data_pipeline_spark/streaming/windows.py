"""Watermarked event-time window aggregation — SURVEY.md §2.C6.

The reference's one stream-shaped element is the periodic
EventBridge-driven incremental pull (/root/reference/README.md:3,
`since` cursor at extract.py:18). Generalized here to real
Structured Streaming: event-time tumbling / sliding / session
windows with a watermark that bounds state and drops late rows.

Batch/stream parity: the SAME aggregation expression runs in batch
mode (registry.py `tumbling_window_agg`, oracle-checked by DuckDB)
— this module only adds the streaming wrapper, so correctness is
established on the batch twin and the streaming path is smoke-tested
(a stream has no SQL oracle — SURVEY.md §7.6).

Scale: streaming state lives per (window × key) in the state store;
the watermark is what keeps it bounded at 100 TB/day — without it,
state grows forever. Late rows beyond the watermark are dropped, not
merged (documented engine policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import MONEY_DECIMAL


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) windowed aggregation.

    Works on both batch and streaming DataFrames — watermark is a
    no-op in batch, exactly Spark's unified-API contract; the batch
    run is the oracle-checkable twin.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        src.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sessionized_counts(
    events: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by `gap`.

    F.session_window is Spark's native stateful session operator —
    merging state per key, bounded by the watermark in streaming.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_events_from_files(
    spark, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of parquet drops — the
    incremental-batch shape (Trigger.AvailableNow processes the
    backlog then stops; the idiom for EventBridge-style periodic runs)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_stream_to_memory(
    windowed: DataFrame, query_name: str, timeout_sec: int = 60
) -> None:
    """Drive a streaming aggregation into an in-memory sink until the
    backlog is drained (complete mode — windowed aggs re-emit)."""
    q = (
        windowed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
