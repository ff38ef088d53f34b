"""Stream-stream interval join — SURVEY.md §2.C6 extension.

The reference correlates entities only in batch SQL
(/root/reference/src/sql/transform_bronze_to_silver.sql joins
transactions to merchants). The streaming generalization every
event pipeline needs is *attribution*: join two event streams on a
key within a bounded event-time gap (click → purchase within an
hour). Spark's stream-stream join is exactly this, provided both
sides carry watermarks and the join condition bounds event time —
that bound is what lets the engine discard buffered state, keeping
memory finite at 100 TB/day.

Unified-API contract: the SAME function runs on batch DataFrames
(watermarks are no-ops) where it is a plain interval join — that
batch twin is registered in registry.py (`interval_join_attribution`)
and oracle-checked against DuckDB; the streaming path is asserted
equal to the batch result in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to every click by the same user in the
    ``max_gap_seconds`` before it (inclusive of the purchase instant).

    Streaming: both sides get the watermark, and the two-sided time
    bound (`click.ts` in [purchase.ts − gap, purchase.ts]) lets Spark
    evict click state older than watermark + gap — bounded state, the
    non-negotiable property for an unbounded stream.

    Batch: identical semantics, a plain range-condition join; Catalyst
    plans the equi-part (user_id) as the shuffle key and applies the
    interval predicate as a post-join filter.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    joined = p.join(
        c,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        ),
        "inner",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_ts",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "gap_seconds"
        ),
    )


def dedup_stream_within_watermark(
    events: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it — the streaming analogue of the batch
    first-wins dedup (operators/dedup.py), trading "dedup over all
    history" for "dedup within the lateness horizon", which is the
    only version with finite state on an unbounded stream.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
        return src.dropDuplicatesWithinWatermark(key_cols)
    return src.dropDuplicates(key_cols)
