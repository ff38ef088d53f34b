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


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable approximate FREQUENCY state
# ---------------------------------------------------------------------------
# HLL answers "how many distinct"; count-min answers "how often does
# key k occur" with state of fixed size d·w counters regardless of
# cardinality (Cormode & Muthukrishnan 2005). Built here from plain
# DataFrame ops so the state is an inspectable, engine-portable table
# rather than an opaque binary: row r of the sketch hashes each key
# with `xxhash64(key, seed_r) mod w` and sums the per-cell counts —
# one JVM-side hash aggregate, map-side combinable. Merging sketches
# is counter addition (union + sum), so state composes across batches,
# partitions, and days exactly like pipeline/incremental.py's algebraic
# state. Point estimate = MIN over the d rows of the key's cell count:
# always >= the true count, and <= true + εN with probability 1−δ for
# w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

CMS_DEPTH = 5     # d rows  → δ = e^-5 ≈ 0.7% failure probability
CMS_WIDTH = 2048  # w cells → ε = e/2048 ≈ 0.13% of total count


def cms_state(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build count-min state `(row, cell) -> cnt` for `key_col`.

    d·w fixed-size counter table; `xxhash64` is seeded per row so the
    d hash functions are independent. One shuffle of at most d·w
    groups no matter how many input rows — at 100 TB the map-side
    partial aggregate does nearly all the work.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    return (
        df.select(F.col(key_col).alias("__key"))
        .select("__key", rows)
        .groupBy(
            "__row",
            F.pmod(F.xxhash64(F.col("__key"), F.col("__row")), F.lit(width)).alias(
                "__cell"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("__row", "row")
        .withColumnRenamed("__cell", "cell")
    )


def cms_merge(*states: DataFrame) -> DataFrame:
    """Merge sketches by counter addition (commutative + associative:
    batching-invariant, any merge tree yields identical state)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    state: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate the frequency of every key in `probes`: re-hash each
    probe key into its d cells, broadcast-join the (≤ d·w row) state,
    take the per-key MIN. Guaranteed `estimate >= true count`."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probe_cells = (
        probes.select(F.col(key_col))
        .distinct()
        .select(key_col, rows)
        .withColumn(
            "cell", F.pmod(F.xxhash64(F.col(key_col), F.col("row")), F.lit(width))
        )
    )
    return (
        probe_cells.join(F.broadcast(state), ["row", "cell"], "left")
        .fillna({"cnt": 0})
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


# --- deterministic HyperLogLog (oracle-checkable) ---------------------------

_HLL_MOD = 2_147_483_647
# alpha_1024 = 0.7213 / (1 + 1.079/1024), floor'd to ppm — a HARDCODED
# literal shared with the oracle twin (computing it would put a libm
# division result into a hash-checked output)
_HLL_ALPHA_PPM_M1024 = 720_539


def hll_deterministic(
    df: DataFrame, key_col: str, m: int = 1024
) -> DataFrame:
    """HyperLogLog distinct-count estimate that is BIT-IDENTICAL across
    engines — unlike approx_count_distinct (whose xxhash64/HLL++ state
    is a Spark implementation detail), every step here is exact
    integer arithmetic on the engine-agnostic polynomial hash family,
    so the ESTIMATE itself carries a DuckDB oracle twin: approximate
    in accuracy, deterministic in value.

    Construction (Flajolet et al. 2007, raw estimator):
      * h = 62-bit two-base hash of the integer key (the _poly_hash62
        family: (x·2654435761 mod 2³¹−1)·2³¹ + (x·40503+12345 mod
        2³¹−1));
      * bucket = h & (m−1), payload w = h >> log2(m) — pure shifts,
        h is non-negative;
      * rho = trailing-zeros(w) + 1 via the pure-integer identity
        bit_count((w & −w) − 1) + 1 — no log2, no libm (P(rho ≥ k) =
        2^−(k−1), the HLL geometric); w = 0 → the max register 53;
      * register_b = max rho per bucket (one m-key groupBy — the
        sketch state is mergeable by construction: max commutes);
      * harmonic sum EXACTLY: Z⁻¹ = Σ_b 2^(−reg_b), scaled by 2⁶⁴ →
        S = Σ_seen shiftleft(1, 63−reg)·2 + (m − seen)·2⁶⁴, all in
        DECIMAL(38,0) (63−reg ≤ 62 keeps the shift inside int64);
      * estimate = α_m·m²·2⁶⁴ DIV (S·10⁶) — all integer, one floor;
        α_m is a hardcoded ppm literal shared with the oracle.

    Raw estimator only (no small/large-range corrections — they need
    libm ln; for n ≳ 2.5·m the raw estimate IS the standard one, and
    the registry query counts a domain far above that). Error ~
    1.04/√m ≈ 3.3% at m=1024. Output: (m, buckets_seen, est_distinct).
    Plan: one map-side hash projection + one m-key partial-agg'd
    groupBy + one m-row aggregate — the fact table is touched once,
    and the m-register state is exactly what an incremental/streaming
    variant would checkpoint."""
    if m != 1024:
        raise ValueError("alpha constant is hardcoded for m=1024")
    shift = 10  # log2(m)
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_HLL_MOD))
    h = (x * F.lit(2_654_435_761) % F.lit(_HLL_MOD)) * F.lit(
        2_147_483_648
    ) + (x * F.lit(40_503) + F.lit(12_345)) % F.lit(_HLL_MOD)
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        h.bitwiseAND(F.lit(m - 1)).cast("int").alias("__b"),
        F.shiftright(h, shift).alias("__w"),
    )
    regs = (
        hashed.withColumn(
            "__rho",
            F.when(
                F.col("__w") > 0,
                F.bit_count(
                    F.col("__w").bitwiseAND(-F.col("__w")) - F.lit(1)
                )
                + F.lit(1),
            )
            .otherwise(F.lit(53))
            .cast("int"),
        )
        .groupBy("__b")
        .agg(F.max("__rho").alias("reg"))
    )
    dec = "decimal(38,0)"
    s = regs.agg(
        F.count(F.lit(1)).cast("long").alias("seen"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 63 - reg)")
            .cast(dec)
            * F.lit(2)
        ).alias("__ssum"),
    )
    return s.select(
        F.lit(m).cast("int").alias("m"),
        F.coalesce(F.col("seen"), F.lit(0)).alias("buckets_seen"),
        F.when(
            F.col("seen") > 0,
            F.expr(
                f"CAST(CAST({_HLL_ALPHA_PPM_M1024} AS DECIMAL(38,0))"
                f" * {m} * {m}"
                f" * CAST(18446744073709551616 AS DECIMAL(38,0))"
                f" DIV ((`__ssum` + ({m} - seen)"
                f" * CAST(18446744073709551616 AS DECIMAL(38,0)))"
                f" * 1000000) AS BIGINT)"
            ),
        ).alias("est_distinct"),
    )
