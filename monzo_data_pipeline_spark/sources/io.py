"""Schema-pinned readers and layout-aware writers.

The reference's entire I/O surface is one SQLite file round-tripped
through S3 (/root/reference/src/main.py:42-49,67-69). The engine
replaces it with direct columnar I/O: parquet (primary), CSV/JSON
(interchange), all with DECLARED schemas — inference is a scan of the
data and a correctness hazard (SURVEY.md §1.2: the reference has no
inference either).

Writer layout is where 100 TB performance is decided:
  * partitionBy(date) → incremental loads touch one directory;
    time-range predicates become partition pruning (never list, let
    alone read, other days);
  * sortWithinPartitions(key) → parquet min/max page stats make key
    lookups skip pages;
  * explicit file sizing via repartition(n) before write — many small
    files poison listing; one giant file poisons parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """NDJSON reader — the wire format a REST ingest would land as raw
    payloads before flattening (A7)."""
    return spark.read.schema(schema).json(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
    target_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Layout-aware table write (the A5 sink, done columnar)."""
    out = df
    if target_files:
        out = out.repartition(target_files, *(partition_by or []))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
