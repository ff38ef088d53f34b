"""Scale-adaptive parallelism floor for per-row-expensive stages.

Single-row-group parquet files scan as ONE task no matter how the
split configs are set (a row group is the vectorized reader's atomic
unit), so at entity scale every pre-shuffle stage — media codecs in
mapInPandas, tokenize/explode chains, vector math — runs serially
while the rest of the cluster idles. The optimization guide's fix for
concentrated input ("one huge unsplittable file … repartition
immediately after the read", §2.5) is applied here as a reusable
helper: raise the partition count to the session's default
parallelism, but ONLY when the input arrives narrower than that.

A cluster-scale scan (100 TB → thousands of splits) passes through
untouched — the exchange exists exactly when the data was too
concentrated for the cluster, so this is not a local[32]-only tune:
``defaultParallelism`` is the cluster's core count everywhere.

When ``keys`` are given the repartition hashes on them, so every
downstream per-key operation (window, groupBy, distinct on the same
key) inherits the clustering and pays no second shuffle — the
pay-the-shuffle-once posture (ext/dedup_fuzzy.py::word_shingles
established the pattern; this module makes it shared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    ``defaultParallelism``) partitions when it arrives narrower.

    No-op (returns ``df`` unchanged, no exchange) when the input
    already has at least ``target`` partitions. Hash-partitions on
    ``keys`` when given, else round-robin.
    """
    if df.isStreaming:
        # a streaming frame has no static partition count to inspect
        # (df.rdd raises), and micro-batch parallelism is the source's
        # business — pass through untouched
        return df
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)
