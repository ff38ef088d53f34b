"""Mergeable distinct-count state: HLL sketches and roaring bitmaps.

pipeline/incremental.py handles *algebraic* aggregates (sum/count/avg
decompose into mergeable scalars). Distinct counts are *holistic* —
no fixed-size exact scalar state exists — so their incremental/
distributed forms are mergeable STRUCTURES:

  * HLL sketch (approx, fixed ~KB state): `hll_sketch_agg` per
    group/batch, `hll_union_agg` to merge, `hll_sketch_estimate` to
    finalize. Error ~1.6% at default lgConfigK=12, constant memory —
    the 100 TB default for "distinct users per day, merged to any
    rollup".
  * Roaring bitmap (EXACT, state ∝ distinct values but compressed):
    bucket the integer key space into 32k-bit ranges
    (`bitmap_bucket_number`), build one bitmap per bucket
    (`bitmap_construct_agg` of `bitmap_bit_position`), merge with
    `bitmap_or_agg`, count with `bitmap_count`. Exact answers with
    mergeable state — the right tool when keys are dense integers
    (user ids, order keys) and exactness is required.

Both are order- and batching-invariant (union/OR are commutative,
associative, idempotent), which also makes them re-run-safe: merging
the same batch twice does not change the estimate — a property plain
partial SUM states do NOT have (tests assert it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group HLL sketch state (binary) for distinct `value_col`."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col).alias("hll_state")
    )


def hll_merge(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Merge any number of per-group state tables (union ∘ hll_union_agg)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.hll_union_agg("hll_state").alias("hll_state")
    )


def hll_finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    return state.select(
        *keys, F.hll_sketch_estimate("hll_state").alias("approx_distinct")
    )


def bitmap_distinct(
    df: DataFrame, keys: list[str], int_col: str
) -> DataFrame:
    """EXACT distinct count of a dense-integer column via roaring
    bitmaps: two-level agg (per 32k bucket, then sum of bitmap
    cardinalities). Both levels are ordinary hash aggregates with
    map-side partial merge; state is compressed bitmaps, not raw keys.
    """
    per_bucket = df.groupBy(
        *keys, F.bitmap_bucket_number(F.col(int_col)).alias("__bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col(int_col))).alias("__bm")
    )
    return per_bucket.groupBy(*keys).agg(
        F.sum(F.bitmap_count("__bm")).alias("n_distinct")
    )


def bitmap_state(df: DataFrame, keys: list[str], int_col: str) -> DataFrame:
    """Mergeable exact-distinct state: (keys, bucket) → bitmap."""
    return df.groupBy(
        *keys, F.bitmap_bucket_number(F.col(int_col)).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col(int_col))).alias("bm")
    )


def bitmap_merge(*states: DataFrame, keys: list[str]) -> DataFrame:
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys, "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )


def bitmap_finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    return state.groupBy(*keys).agg(
        F.sum(F.bitmap_count("bm")).alias("n_distinct")
    )
