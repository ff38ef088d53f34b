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
