"""Window-function operators — SURVEY.md §2 row C9 (+ the rank-window
form of A17/A24).

Scale note: a window partitioned by a key shuffles once on that key
and sorts within partitions — state is bounded per key. A window with
a GLOBAL order (no partitionBy) serializes onto one task and is
forbidden in this engine's hot paths; running totals are always per
entity (customer, month), never whole-table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.deterministic import MONEY_DECIMAL


def top_n_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    n: int,
    descending: bool = True,
) -> DataFrame:
    """C9 — deterministic top-n per group via row_number (callers put a
    unique tiebreak last in order_cols)."""
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*partition_cols).orderBy(*ordering)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= n)
    )


def running_total(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """C9 — per-entity running balance (rows UNBOUNDED PRECEDING..CURRENT).

    Sums in DECIMAL then casts double so the prefix sums are
    order-exact and oracle-comparable (functions/deterministic.py).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.sum(F.col(value_col).cast(MONEY_DECIMAL)).over(w).cast("double")
    )


def rolling_range_sum(
    df: DataFrame,
    partition_cols: list[str],
    ts_col: str,
    value_col: str,
    lookback_seconds: int,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """C9 — time-based RANGE frame: per entity, sum of ``value_col``
    over rows whose timestamp lies within ``lookback_seconds`` before
    the current row's timestamp (inclusive both ends).

    Spark's ``rangeBetween`` needs a numeric ORDER BY, so the frame is
    ordered by epoch seconds (``unix_timestamp``). RANGE frames are
    tie-deterministic (all peers of the current timestamp are in the
    frame), so the output is stable no matter how rows land in
    partitions — unlike a ROWS frame over a non-unique ordering.

    Scale: one shuffle on ``partition_cols``; per-key state is a
    sliding sum, memory bounded by the widest window per key.
    """
    epoch = F.unix_timestamp(F.col(ts_col)).alias("__epoch")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col("__epoch").asc())
        .rangeBetween(-lookback_seconds, 0)
    )
    return (
        df.withColumn("__epoch", epoch)
        .withColumn(
            out_col, F.sum(F.col(value_col).cast(MONEY_DECIMAL)).over(w).cast("double")
        )
        .drop("__epoch")
    )


def rank_distribution(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """C9 — percent_rank + cume_dist within each partition.

    Both functions are tie-stable by definition (peers share a value),
    so they are deterministic on non-unique orderings; rounding absorbs
    the one division both engines do in binary double.
    """
    w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col).asc())
    return df.select(
        *partition_cols,
        order_col,
        F.round(F.percent_rank().over(w), round_digits).alias("pct_rank"),
        F.round(F.cume_dist().over(w), round_digits).alias("cume_dist"),
    )
