"""Skew-mitigation utilities.

AQE's skew-join splitting handles JOIN skew automatically
(session.py enables it); aggregation skew over a pathological hot key
still serializes into one reducer. The classic fix is two-phase
salted aggregation: spray the hot key across S sub-keys, partially
aggregate, then aggregate the S partials. Exact same result for any
algebraic aggregate; S× more parallelism on the hot key.

At 100 TB this is the difference between a 5-minute stage and one
straggler task running for hours.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
    value_cast: str = "decimal(18,2)",
) -> DataFrame:
    """Two-phase SUM/COUNT with salting. Deterministic salt
    (xxhash64 of a stable row attribute, NOT rand()) keeps re-runs and
    oracle comparisons stable; decimal accumulation keeps the result
    independent of how rows were salted.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(value_col).cast(value_cast)).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__psum").cast("double").alias("total"),
            F.sum("__pcnt").alias("cnt"),
        )
    )
