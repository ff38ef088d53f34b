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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    salt_buckets: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-join via key salting: the manual form of AQE's skew split,
    for when the small side is too big to broadcast but the large side
    has hot keys that would serialize one reducer.

    Mechanics: the skewed side gets a deterministic salt in
    [0, salt_buckets); the other side is replicated across ALL salt
    values (explode of a literal range — S× duplication of the
    smaller side only). Joining on (key, salt) spreads each hot key
    over S reducers. Result is row-identical to the plain join.

    The salt must NOT be rand(): a nondeterministic salt breaks task
    retry (a re-executed task re-salts differently than the shuffle
    files already written). Default salt = xxhash64 of the skewed
    side's whole-row-stable attribute (`salt_source`, defaulting to
    the key itself via its string form plus a per-row hash of all
    columns would be overkill; monotonic ids are forbidden for the
    same retry reason).
    """
    if salt_source is None:
        # hash every column → uniform spray even when the hot key's
        # other attributes repeat; still deterministic per row content
        salt_col = F.pmod(F.xxhash64(*skewed.columns), F.lit(salt_buckets))
    else:
        salt_col = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    left = skewed.withColumn("__salt", salt_col)
    right = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)])),
    )
    out = left.join(
        right,
        (left[skewed_key] == right[other_key]) & (left["__salt"] == right["__salt"]),
        how,
    )
    return out.drop("__salt")
