"""Bucketed-table layout: shuffle-free co-located joins and aggregations.

The 100 TB fact-fact join problem: ``lineitem ⋈ orders`` on orderkey
shuffles BOTH sides every time it runs — at 100 TB that shuffle is the
job. The classical fix (Hive/Spark bucketing; the same idea as the
reference's SQLite PK B-tree keeping rows key-clustered on disk,
/root/reference/src/sql/create_bronze_layer.sql:2 — clustered layout
bought lookups there, it buys join locality here) is to pay the
shuffle ONCE at write time:

    df.write.bucketBy(N, key).sortBy(key).saveAsTable(...)

Every subsequent equi-join or groupBy on the bucket key reads
pre-co-located, pre-sorted buckets: Catalyst drops the Exchange on the
bucketed side(s), and with both sides bucketed the same way the join
plan has NO shuffle at all — verified by the plan-contract test
(tests/test_bucketing.py asserts zero ``Exchange`` nodes).

Bucket count sizing at scale: buckets are per-table-global (each bucket
is one file per written partition), so pick
``N ≈ table_bytes / target_file_bytes`` (128-512 MB files). Both join
sides must have compatible bucket counts (equal, or one a multiple of
the other with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

Bucket pruning: an equality predicate on the bucket column scans 1/N of
the files (``SelectedBucketsCount`` in the scan node) — the same
mechanism as partition pruning, but for high-cardinality keys where
directory-per-value would explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` additionally sorts within each bucket file — that is
    what lets a sort-merge join skip its Sort as well (and gives
    parquet page-level min/max skipping on the sort key).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys.

    Reads MUST go through the table names (``spark.table``) — reading
    the parquet paths directly loses the bucket metadata and
    reintroduces the shuffle.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the plan-contract metric for co-location (0 = fully co-located)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
