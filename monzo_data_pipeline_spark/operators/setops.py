"""Set operators — SURVEY.md §2 row C8.

Union of incremental batches (the reference's repeated EventBridge
pulls are a stream of unions), intersect / exceptAll for regression
diffs between runs.

Scale note: unionByName is a zero-shuffle plan concatenation;
intersect/except plan as aggregates or left-semi/anti joins on all
columns — fine on projected key subsets, pathological on wide rows,
so callers project first.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_batches(*batches: DataFrame) -> DataFrame:
    """C8 — by-name union of incremental batches (schema-aligned)."""
    return reduce(lambda a, b: a.unionByName(b), batches)


def table_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """C8 — multiset difference left∖right (regression diff between runs)."""
    return left.exceptAll(right)


def table_common(left: DataFrame, right: DataFrame) -> DataFrame:
    """C8 — distinct intersection."""
    return left.intersect(right)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed change-data-capture between two table versions: classify
    every key as added / removed / updated (row-level `table_diff`
    can't tell an update from a delete+insert; this can).

    One full-outer join on the key — both sides shuffle on `keys`
    once; with the tables bucketed on the key (sources/bucketing.py)
    even that exchange disappears. `compare_cols` defaults to all
    non-key columns; comparison is null-safe (<=> — a NULL→value
    transition IS an update, exactly the reference's late-settling
    column arriving).

    Returns keys + change_type; unchanged keys are dropped (at scale
    they are the overwhelming majority — emitting them would make the
    diff as big as the table).
    """
    compare = compare_cols or [c for c in old.columns if c not in keys]
    # explicit presence markers: compare-column nullability can't prove
    # absence (a present row may hold legitimate NULLs), and the join
    # coalesces the key columns
    o = old.select(
        *keys,
        F.lit(True).alias("__in_o"),
        *[F.col(c).alias(f"__o_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_n"),
        *[F.col(c).alias(f"__n_{c}") for c in compare],
    )
    joined = o.join(n, on=keys, how="full_outer")
    in_old = F.coalesce(F.col("__in_o"), F.lit(False))
    in_new = F.coalesce(F.col("__in_n"), F.lit(False))
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    return (
        joined.withColumn(
            "change_type",
            F.when(~in_old, F.lit("added"))
            .when(~in_new, F.lit("removed"))
            .when(~same, F.lit("updated")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
