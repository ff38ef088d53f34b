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


def union_batches(*batches: DataFrame) -> DataFrame:
    """C8 — by-name union of incremental batches (schema-aligned)."""
    return reduce(lambda a, b: a.unionByName(b), batches)


def table_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """C8 — multiset difference left∖right (regression diff between runs)."""
    return left.exceptAll(right)


def table_common(left: DataFrame, right: DataFrame) -> DataFrame:
    """C8 — distinct intersection."""
    return left.intersect(right)
