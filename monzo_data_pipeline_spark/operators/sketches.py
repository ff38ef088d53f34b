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


# --- deterministic count-min (oracle-checkable) -----------------------------

# Carter-Wegman row hashes h_r(x) = (x·A_r + B_r) mod P, cell = h mod w
# — fixed literal (A, B) pairs over the same 2³¹−1 prime as the HLL/KMV
# family, so the SKETCH STATE ITSELF is bit-identical across engines
# (the xxhash64 variant above is Spark-internal). x < P and A < 2³¹
# keep x·A + B < 2⁶² — exact in int64 on both engines.
_CMS_P = 2_147_483_647
_CMS_ROWS = (
    (506_952_114, 12_345),
    (40_503, 98_765),
    (1_103_515_245, 54_321),
    (69_069, 777_777_777),
)
CMS_DET_WIDTH = 512


def cms_state_det(
    df: DataFrame, key_col: str, width: int = CMS_DET_WIDTH
) -> DataFrame:
    """Count-min state `(row, cell) -> cnt` on the engine-agnostic
    Carter-Wegman hash family — the deterministic twin of `cms_state`
    (same d·w bounded-counter shape, merge law, and MIN estimator;
    see the xxhash64 variant's module comment for the accuracy
    bounds: ε = e/w of total count, δ = e^−d). Integer keys only
    (the hll_deterministic contract); NULLs excluded. One shuffle of
    at most d·w groups — map-side partials do nearly all the work at
    any scale."""
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_CMS_P))
    base = df.filter(F.col(key_col).isNotNull()).select(x.alias("__x"))
    parts = []
    for r, (a, b) in enumerate(_CMS_ROWS):
        parts.append(
            base.select(
                F.lit(r).cast("int").alias("row"),
                F.pmod(
                    (F.col("__x") * F.lit(a) + F.lit(b)) % F.lit(_CMS_P),
                    F.lit(width),
                )
                .cast("int")
                .alias("cell"),
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return allrows.groupBy("row", "cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate_det(
    state: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = CMS_DET_WIDTH,
) -> DataFrame:
    """Frequency estimate for every probe key: re-hash into the d
    cells, broadcast-join the (≤ d·w row) state, MIN across rows.
    Guaranteed estimate ≥ true count (cells only over-count)."""
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_CMS_P))
    cells = []
    for r, (a, b) in enumerate(_CMS_ROWS):
        cells.append(
            probes.select(
                F.col(key_col),
                F.lit(r).cast("int").alias("row"),
                F.pmod(
                    (x * F.lit(a) + F.lit(b)) % F.lit(_CMS_P),
                    F.lit(width),
                )
                .cast("int")
                .alias("cell"),
            )
        )
    probe_cells = cells[0]
    for c in cells[1:]:
        probe_cells = probe_cells.unionByName(c)
    return (
        probe_cells.join(F.broadcast(state), ["row", "cell"], "left")
        .fillna({"cnt": 0})
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_det_oracle_sql(
    src: str, key_expr: str, probe_sql: str, width: int = CMS_DET_WIDTH
) -> str:
    """DuckDB twin of cms_state_det + cms_estimate_det over `src`:
    `probe_sql` must yield (k) probe keys; returns per-probe
    (key, true_cnt, est_cnt)."""
    hashes = " UNION ALL ".join(
        f"SELECT {r} AS row, {a} AS a, {b} AS b"
        for r, (a, b) in enumerate(_CMS_ROWS)
    )
    return f"""
        WITH h(row, a, b) AS ({hashes}),
        keys AS (
            SELECT ((CAST({key_expr} AS BIGINT) % {_CMS_P})
                    + {_CMS_P}) % {_CMS_P} AS x
            FROM {src} WHERE {key_expr} IS NOT NULL
        ),
        state AS (
            SELECT row, (x * a + b) % {_CMS_P} % {width} AS cell,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM keys CROSS JOIN h GROUP BY 1, 2
        ),
        probes AS ({probe_sql}),
        pc AS (
            SELECT p.k, h.row,
                   ((((CAST(p.k AS BIGINT) % {_CMS_P}) + {_CMS_P})
                     % {_CMS_P} * a + b)
                     % {_CMS_P}) % {width} AS cell
            FROM probes p CROSS JOIN h
        ),
        est AS (
            SELECT pc.k, MIN(COALESCE(s.cnt, 0)) AS est_count
            FROM pc LEFT JOIN state s
              ON pc.row = s.row AND pc.cell = s.cell
            GROUP BY 1
        ),
        tru AS (
            SELECT {key_expr} AS k, CAST(COUNT(*) AS BIGINT) AS true_count
            FROM {src} WHERE {key_expr} IS NOT NULL GROUP BY 1
        )
        SELECT est.k, tru.true_count, est.est_count
        FROM est JOIN tru ON est.k = tru.k
        ORDER BY est.k
    """


# --- deterministic Bloom filter (oracle-checkable) ---------------------------

BLOOM_M_BITS = 65_536  # 1024 64-bit words of bounded state
BLOOM_K = 4


def bloom_state(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom filter over integer keys as an inspectable (word, bits)
    table — the MEMBERSHIP sketch that completes the family (HLL =
    how many distinct, CMS = how often, KMV/theta = set overlap,
    bloom = "might this key be present"), and the classic join-prune
    side-channel: ship the ≤ m/64-row state to the fact side and skip
    rows whose key cannot be in the build set.

    Same Carter-Wegman rows as the deterministic CMS, so the STATE is
    bit-identical cross-engine; bit k of word w via shiftleft(1, bit)
    + BIT_OR aggregation (int64 two's-complement shifts agree across
    engines, including bit 63). False-positive rate ≈
    (1 − e^(−k·n/m))^k — size m ≳ 10·k·n for ~1%; merge = per-word
    OR (union of the key sets, exact)."""
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_CMS_P))
    base = df.filter(F.col(key_col).isNotNull()).select(x.alias("__x"))
    parts = []
    for a, b in _CMS_ROWS[:k]:
        pos = F.pmod(
            (F.col("__x") * F.lit(a) + F.lit(b)) % F.lit(_CMS_P),
            F.lit(m_bits),
        )
        parts.append(
            base.select(pos.alias("__pos")).select(
                F.expr("__pos DIV 64").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(__pos % 64 AS INT))"
                ).alias("__bit"),
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return allrows.groupBy("word").agg(
        F.bit_or("__bit").alias("bits")
    )


def bloom_merge(*states: DataFrame) -> DataFrame:
    """Merge filters by per-word OR — exactly the union of key sets."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    state: DataFrame,
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Filter `df` to rows whose key MIGHT be in the build set (every
    one of the k bits set — no false negatives): re-hash each key,
    broadcast-join the bounded state, AND over the k probes. The
    semi-join reduction a 100 TB scan applies before an expensive
    join."""
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_CMS_P))
    probes = []
    for r, (a, b) in enumerate(_CMS_ROWS[:k]):
        pos = F.pmod(
            (x * F.lit(a) + F.lit(b)) % F.lit(_CMS_P), F.lit(m_bits)
        )
        probes.append(
            df.select(
                F.col(key_col).alias("__k"), pos.alias("__pos")
            )
            .select(
                "__k",
                F.expr("__pos DIV 64").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(__pos % 64 AS INT))"
                ).alias("__bit"),
            )
            .distinct()
        )
    allp = probes[0]
    for p in probes[1:]:
        allp = allp.unionByName(p)
    passing = (
        allp.join(F.broadcast(state), "word", "left")
        .select(
            "__k",
            (
                F.coalesce(F.col("bits"), F.lit(0))
                .bitwiseAND(F.col("__bit"))
                != 0
            )
            .cast("int")
            .alias("__hit"),
        )
        .groupBy("__k")
        .agg((F.sum("__hit") == F.lit(k)).alias("__pass"))
        .filter(F.col("__pass"))
        .select(F.col("__k"))
    )
    return df.join(
        F.broadcast(passing),
        F.col(key_col) == passing["__k"],
        "left_semi",
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


def hll_registers_by_group(
    df: DataFrame, key_col: str, group_col: str, m: int = 1024
) -> DataFrame:
    """The grouped deterministic-HLL SKETCH STATE: one (group, bucket,
    reg) register table — ≤ m rows per group, mergeable by MAX within
    a group and UNION+MAX across shards/batches/streams
    (`hll_merge_registers`). Same 62-bit polynomial hash family and
    pure-integer rho as `hll_deterministic`; NULL keys/groups
    excluded. This is the table an incremental/streaming variant
    checkpoints."""
    if m != 1024:
        raise ValueError("alpha constant is hardcoded for m=1024")
    shift = 10  # log2(m)
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_HLL_MOD))
    h = (x * F.lit(2_654_435_761) % F.lit(_HLL_MOD)) * F.lit(
        2_147_483_648
    ) + (x * F.lit(40_503) + F.lit(12_345)) % F.lit(_HLL_MOD)
    hashed = df.filter(
        F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        h.bitwiseAND(F.lit(m - 1)).cast("int").alias("__b"),
        F.shiftright(h, shift).alias("__w"),
    )
    return (
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
        .groupBy("__g", "__b")
        .agg(F.max("__rho").alias("reg"))
    )


def hll_merge_registers(*states: DataFrame) -> DataFrame:
    """Merge grouped register states by UNION + per-(group, bucket)
    MAX — commutative, associative, IDEMPOTENT (max absorbs repeats),
    so any merge tree, batching, or replay yields the identical state:
    registers(batch A) ⊔ registers(batch B) == registers(A ∪ B)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("__g", "__b").agg(F.max("reg").alias("reg"))


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str, m: int = 1024
) -> DataFrame:
    """Finalize grouped register state: the per-group exact-integer
    harmonic fold and α·m²·2⁶⁴ DIV estimate of `hll_deterministic`.
    Output: (group_col, m, buckets_seen, est_distinct)."""
    if m != 1024:
        raise ValueError("alpha constant is hardcoded for m=1024")
    dec = "decimal(38,0)"
    s = regs.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("seen"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 63 - reg)")
            .cast(dec)
            * F.lit(2)
        ).alias("__ssum"),
    )
    return s.select(
        F.col("__g").alias(group_col),
        F.lit(m).cast("int").alias("m"),
        F.col("seen").alias("buckets_seen"),
        F.expr(
            f"CAST(CAST({_HLL_ALPHA_PPM_M1024} AS DECIMAL(38,0))"
            f" * {m} * {m}"
            f" * CAST(18446744073709551616 AS DECIMAL(38,0))"
            f" DIV ((`__ssum` + ({m} - seen)"
            f" * CAST(18446744073709551616 AS DECIMAL(38,0)))"
            f" * 1000000) AS BIGINT)"
        ).alias("est_distinct"),
    )


def hll_estimate_global_from_registers(
    regs: DataFrame, m: int = 1024
) -> DataFrame:
    """Finalize GROUPED register state into the GLOBAL estimate: the
    merge law in one step — per-bucket MAX over every group collapses
    the (group, bucket) table to the exact registers the ungrouped
    `hll_deterministic` would have built over the same rows (the hash
    is per-key, so a key present in several groups writes the same
    (bucket, rho) each time and MAX absorbs the repeats), then the
    identical harmonic fold. PRECONDITION: every row that should be
    counted carries a non-NULL group key (grouped register builds
    exclude NULL groups); the cross-engine hash gate covers the
    registry uses. Output: (m, buckets_seen, est_distinct) — the
    `hll_deterministic` schema."""
    if m != 1024:
        raise ValueError("alpha constant is hardcoded for m=1024")
    collapsed = regs.groupBy("__b").agg(F.max("reg").alias("reg"))
    dec = "decimal(38,0)"
    s = collapsed.agg(
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


def hll_deterministic_by_group(
    df: DataFrame, key_col: str, group_col: str, m: int = 1024
) -> DataFrame:
    """`hll_deterministic` fanned out per group — the shape a 100 TB
    rollup actually materializes: one (group, bucket) register table
    (≤ m rows per group, mergeable by MAX within a group and
    UNION+MAX across shards/streams — `hll_registers_by_group` /
    `hll_merge_registers`), one per-group harmonic fold
    (`hll_estimate_from_registers`). Groups are bounded-cardinality
    dimensions (months, sources); the fact table is touched once.
    NULL group keys are excluded (a dimension rollup has no NULL
    lane; the oracle twin mirrors the filter). Output: (group_col, m,
    buckets_seen, est_distinct) — the ESTIMATE is bit-identical
    cross-engine, exactly as the global form."""
    return hll_estimate_from_registers(
        hll_registers_by_group(df, key_col, group_col, m), group_col, m
    )


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile sketch (r6) — the hll_deterministic
# pattern applied to quantiles: approximate in accuracy, bit-identical
# across engines, so the ESTIMATES themselves carry DuckDB oracle twins
# (unlike approx_percentile, whose Greenwald-Khanna state is a Spark
# implementation detail).
#
# Grid: sign-mirrored binary-exponent cells with 32 linear sub-bins.
# For |v| >= 32 the cell containing v is
#     [2^e + s·2^(e-5), 2^e + (s+1)·2^(e-5))   e = ⌊log₂|v|⌋, s ∈ 0..31
# and every |v| < 32 is its own cell — so the within-cell width is
# ≤ |v|/32 everywhere: uniform-interpolated quantile estimates carry a
# RELATIVE error bound of 2⁻⁵ ≈ 3.1% (plus rank error 0: counts are
# exact). State = (cell, count): ≤ 32 + 59·32·2 ≈ 3 810 cells over the
# whole int64 domain regardless of row count — mergeable by SUM,
# bounded per partial aggregate, exactly what a 100 TB scan shuffles.
#
# Everything is integer: the exponent via length(bin(|v|)) − 1 (both
# engines' bin() — no libm log2 at a cell boundary), sub-bins and cell
# bounds via shifts, interpolation via one DECIMAL(38,0) product + DIV.
# ---------------------------------------------------------------------------

GRID_SUB_BITS = 5  # 32 sub-bins per binary exponent

# |v| saturates at ±2^62: abs(-2^63) wraps in non-ANSI mode, and one
# guard bit keeps every shift below 63. Values beyond collapse into the
# extreme cells (quantile estimates there saturate too — documented).
_GRID_CLAMP = 1 << 62


def _shl(x: str, n: str, dialect: str) -> str:
    if dialect == "spark":
        return f"SHIFTLEFT({x}, {n})"
    return f"(({x}) << ({n}))"


def _shr(x: str, n: str, dialect: str) -> str:
    if dialect == "spark":
        return f"SHIFTRIGHT({x}, {n})"
    return f"(({x}) >> ({n}))"


def grid_cell_expr(v_col: str, dialect: str = "spark") -> str:
    """SQL expression mapping a BIGINT column to its grid cell index —
    monotonic in the value. ``dialect`` picks the shift-operator
    spelling ("spark" → SHIFTLEFT/SHIFTRIGHT, "duckdb" → << / >>);
    the arithmetic is identical, which is the whole point: the oracle
    twin reproduces every cell assignment bit-for-bit."""
    v = (
        f"GREATEST(LEAST(CAST({v_col} AS BIGINT), {_GRID_CLAMP}), "
        f"-{_GRID_CLAMP})"
    )
    u = f"ABS({v})"
    e = f"(LENGTH(BIN({u})) - 1)"
    one = "CAST(1 AS BIGINT)"
    idx_u = (
        f"CASE WHEN {u} < 32 THEN {u} ELSE "
        f"32 + CAST(({e} - 5) AS BIGINT) * 32 "
        f"+ {_shr(f'{u} - {_shl(one, e, dialect)}', f'{e} - 5', dialect)} "
        f"END"
    )
    return f"CASE WHEN {v} < 0 THEN -({idx_u}) ELSE ({idx_u}) END"


def grid_lo_w_exprs(
    cell_col: str, dialect: str = "spark"
) -> tuple[str, str]:
    """SQL expressions for a cell's inclusive lower bound and width."""
    a = f"ABS({cell_col})"
    if dialect == "spark":
        e5 = f"CAST(({a} - 32) DIV 32 AS INT)"
    else:
        e5 = f"CAST(({a} - 32) // 32 AS INT)"
    one = "CAST(1 AS BIGINT)"
    w = (
        f"CASE WHEN {a} < 32 THEN CAST(1 AS BIGINT) "
        f"ELSE {_shl(one, e5, dialect)} END"
    )
    lo_u = (
        f"CASE WHEN {a} < 32 THEN {a} "
        f"ELSE {_shl(one, f'5 + {e5}', dialect)} "
        f"+ (({a} - 32) % 32) * {_shl(one, e5, dialect)} END"
    )
    lo = (
        f"CASE WHEN {cell_col} < 0 THEN -(({lo_u}) + ({w}) - 1) "
        f"ELSE ({lo_u}) END"
    )
    return lo, w


def quantile_grid_cells(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """The sketch state: (group..., cell, cnt) — one partial-agg'd
    groupBy, bounded ≤ ~3 810 cells per group, mergeable by SUM."""
    groups = group_cols or []
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(*groups, F.expr(grid_cell_expr(value_col)).alias("cell"))
        .groupBy(*groups, "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _est_expr(r_col: str, below_col: str) -> str:
    """Uniform within-cell interpolation toward the 0-based rank
    ``r_col``: lo + ⌊(r − below)·w / cnt⌋ — the product in
    DECIMAL(38,0) (w ≤ 2⁵⁷, offsets row-count sized)."""
    lo, w = grid_lo_w_exprs("cell")
    return (
        f"CAST(({lo}) + CAST(({r_col} - {below_col}) AS DECIMAL(38,0)) "
        f"* ({w}) DIV cnt AS BIGINT)"
    )


def sketch_quantiles(
    df: DataFrame, value_col: str, probs_ppm: list[int]
) -> DataFrame:
    """GLOBAL deterministic quantile estimates: one (p_ppm, est) row
    per requested probability. Rank definition: the 0-based "lower"
    rank r = (p_ppm · (n−1)) DIV 10⁶ — the estimate targets the r-th
    order statistic. Cumulative counts ride attach_count_below
    (exponent-bucketed PARTITIONED window — no global sort), so the
    whole plan is: one fact scan → ≤3 810-row cell table → O(k)
    scalars."""
    return sketch_quantiles_from_cells(
        quantile_grid_cells(df, value_col), probs_ppm
    )


def sketch_quantiles_from_cells(
    cells: DataFrame, probs_ppm: list[int]
) -> DataFrame:
    """`sketch_quantiles` finalization from a prebuilt/merged (cell,
    cnt) state table (`quantile_grid_cells` / `merge_grid_cells`) —
    the read side of incremental/streaming grid maintenance, and the
    fast path when several extractions share one cell build. n is
    derived FROM the state (Σcnt == the rows the state absorbed)."""
    from ..ext.lineage import truncate_lineage
    from .rankstats import attach_count_below

    pc = cells.select(
        F.col("cell").alias("__x"), F.col("cnt").alias("__c")
    )
    if not pc.isStreaming:
        # the finalization fans pc into THREE branches (ranked window,
        # bucket offsets, in-plan n); materialize the ≤ ~3 810-row cell
        # state once so a fact-scale cells subtree (quantile_grid_cells
        # over a raw column) is not recomputed per branch — exchange
        # reuse does not dedupe across the broadcast boundaries here
        pc = truncate_lineage(pc)
    ranked = attach_count_below(pc).select(
        F.col("__x").alias("cell"),
        F.col("__c").alias("cnt"),
        F.col("__r").alias("below"),
    )
    # r10: n and the per-probability target ranks are computed IN-PLAN
    # (1-row Σcnt agg exploded to one row per probability), so the
    # whole finalization is one lazy plan — no collect, no per-call n
    # job. The LEFT join keeps the one-row-per-probability contract on
    # empty state (est NULL), matching the old n == 0 branch; for
    # n ≥ 1 exactly one cell satisfies below ≤ r < below + cnt, so the
    # rows equal the old inner explode+filter. r = (p·(n−1)) DIV 10⁶
    # is nonnegative there, so SQL DIV matches the old Python floor.
    n1 = pc.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__n")
    )
    targets = n1.select(
        F.explode(
            F.array(
                *[F.lit(p).cast("long") for p in sorted(probs_ppm)]
            )
        ).alias("p_ppm"),
        "__n",
    ).select(
        "p_ppm",
        F.expr("CAST((p_ppm * (__n - 1)) DIV 1000000 AS BIGINT)").alias(
            "__r"
        ),
    )
    return (
        targets.join(
            # broadcast the ≤ ~3 810-row ranked cell table (the BUILD
            # side of a LEFT join must be the right side)
            F.broadcast(ranked),
            (F.col("__r") >= F.col("below"))
            & (F.col("__r") < F.col("below") + F.col("cnt")),
            "left",
        )
        .select(
            F.col("p_ppm"),
            F.expr(_est_expr("__r", "below")).alias("est"),
        )
    )


def sketch_quantiles_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs_ppm: list[int],
) -> DataFrame:
    """Per-group deterministic quantile estimates: (group..., p_ppm,
    est). The cumulative window is PARTITIONED by the group columns
    and its input is the per-group cell table — ≤ ~3 810 rows per
    group BY CONSTRUCTION (the sketch bound), so no task ever sees
    unbounded state no matter how large or skewed the groups are."""
    return sketch_quantiles_by_group_from_cells(
        quantile_grid_cells(df, value_col, group_cols),
        group_cols,
        probs_ppm,
    )


def sketch_quantiles_by_group_from_cells(
    cells: DataFrame,
    group_cols: list[str],
    probs_ppm: list[int],
) -> DataFrame:
    """`sketch_quantiles_by_group` finalization from a prebuilt/merged
    (group..., cell, cnt) state table — the streaming read side, and
    the shared-cells fast path. Per-group totals come FROM the state
    (one agg over ≤3 810 rows per group), not a second fact scan."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = cells.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("__n")
    )
    probs = ", ".join(str(p) for p in sorted(probs_ppm))
    return (
        cells.withColumn(
            "below", F.coalesce(F.sum("cnt").over(w), F.lit(0).cast("long"))
        )
        .join(F.broadcast(tot), on=group_cols)
        .select(
            *group_cols,
            "cell",
            "cnt",
            "below",
            "__n",
            F.expr(f"explode(array({probs}))").alias("p_ppm"),
        )
        .withColumn(
            "__r",
            F.expr("CAST(p_ppm AS DECIMAL(38,0)) * (__n - 1) DIV 1000000")
            .cast("long"),
        )
        .filter(
            (F.col("__r") >= F.col("below"))
            & (F.col("__r") < F.col("below") + F.col("cnt"))
        )
        .select(
            *group_cols,
            "p_ppm",
            F.expr(_est_expr("__r", "below")).alias("est"),
        )
    )


# --- oracle twins (DuckDB SQL builders) --------------------------------------
# The registry's oracle strings are BUILT from the same expression
# helpers the Spark plans use, so a grid change cannot silently desync
# the twin. CTE names are prefixed so two sketches can share one query
# (the MAD screen runs the grid twice).


def grid_quantile_sql(src: str, probs_ppm: list[int], prefix: str = "gq") -> str:
    """DuckDB CTE block (no leading WITH) computing ``{prefix}_est`` =
    (p_ppm, est) over relation/CTE ``src`` exposing a BIGINT column
    ``v`` — the oracle twin of ``sketch_quantiles``."""
    cell = grid_cell_expr("v", "duckdb")
    lo, w = grid_lo_w_exprs("cell", "duckdb")
    probs = ", ".join(f"({p})" for p in sorted(probs_ppm))
    return f"""
    {prefix}_cells AS (
        SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {src} WHERE v IS NOT NULL GROUP BY 1
    ), {prefix}_r AS (
        SELECT cell, cnt,
               CAST(COALESCE(SUM(cnt) OVER (ORDER BY cell
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS below
        FROM {prefix}_cells
    ), {prefix}_n AS (
        SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n
        FROM {prefix}_cells
    ), {prefix}_t AS (
        SELECT p_ppm,
               CAST(CAST(p_ppm AS HUGEINT) * (n - 1) // 1000000 AS BIGINT)
                   AS rk
        FROM (VALUES {probs}) p(p_ppm), {prefix}_n
    ), {prefix}_est AS (
        SELECT t.p_ppm AS p_ppm,
               CAST(({lo}) + CAST((t.rk - r.below) AS HUGEINT) * ({w})
                    // r.cnt AS BIGINT) AS est
        FROM {prefix}_t t JOIN {prefix}_r r
          ON t.rk >= r.below AND t.rk < r.below + r.cnt
    )"""


def grid_quantile_by_group_sql(
    src: str, probs_ppm: list[int], prefix: str = "gg"
) -> str:
    """DuckDB CTE block computing ``{prefix}_est`` = (g, p_ppm, est)
    over relation/CTE ``src`` exposing (g, v) — the oracle twin of
    ``sketch_quantiles_by_group``."""
    cell = grid_cell_expr("v", "duckdb")
    lo, w = grid_lo_w_exprs("cell", "duckdb")
    probs = ", ".join(f"({p})" for p in sorted(probs_ppm))
    return f"""
    {prefix}_cells AS (
        SELECT g, {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {src} WHERE v IS NOT NULL GROUP BY 1, 2
    ), {prefix}_r AS (
        SELECT g, cell, cnt,
               CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY cell
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS below
        FROM {prefix}_cells
    ), {prefix}_n AS (
        SELECT g, CAST(SUM(cnt) AS BIGINT) AS n
        FROM {prefix}_cells GROUP BY 1
    ), {prefix}_t AS (
        SELECT n.g, p.p_ppm,
               CAST(CAST(p.p_ppm AS HUGEINT) * (n.n - 1) // 1000000
                    AS BIGINT) AS rk
        FROM {prefix}_n n, (VALUES {probs}) p(p_ppm)
    ), {prefix}_est AS (
        SELECT t.g, t.p_ppm,
               CAST(({lo}) + CAST((t.rk - r.below) AS HUGEINT) * ({w})
                    // r.cnt AS BIGINT) AS est
        FROM {prefix}_t t JOIN {prefix}_r r
          ON t.g = r.g AND t.rk >= r.below AND t.rk < r.below + r.cnt
    )"""


def merge_grid_cells(*states: DataFrame) -> DataFrame:
    """Merge quantile-grid states by counter addition (union + SUM —
    commutative, associative, batching-invariant), exactly like
    `cms_merge`/`hll_merge`: the cells of batch A ∪ batch B equal the
    cells of A+B computed whole, so a warehouse can persist per-batch
    grid states and answer quantiles over any batch combination
    without rescanning the facts. Accepts outputs of
    `quantile_grid_cells` (with or without group columns — every
    non-(cell, cnt) column is treated as a group key)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c not in ("cnt",)]
    return merged.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# KMV / theta sketch — mergeable distinct state that also supports
# SET-INTERSECTION estimation
# ---------------------------------------------------------------------------
# HLL answers "how many distinct" but two HLLs can only be UNIONed —
# |A ∩ B| falls back to inclusion-exclusion, whose error explodes when
# the intersection is small relative to the sets. The KMV ("k minimum
# values") sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 SIGMOD
# unbiased estimator; productionized as the DataSketches theta sketch)
# keeps the k SMALLEST distinct hash values instead of registers:
#
#   * state     = k smallest distinct h(v) — a k-row TABLE, readable
#     and engine-portable, not an opaque binary;
#   * merge     = union ∘ distinct ∘ k-smallest (EXACT: the k smallest
#     of a union are each within the k smallest of their half, so the
#     merge law holds with equality, not just in distribution —
#     order/batching-invariant and idempotent like hll_merge);
#   * estimate  = (k−1) · D / h_(k) where h_(k) is the k-th smallest
#     hash and D the hash domain size (the Beyer et al. unbiased
#     form); fewer than k distinct values ⇒ the state IS the distinct
#     set and the count is exact;
#   * intersect = theta combine: θ = min(θ_A, θ_B) with θ_X = h_(k)
#     of X (or D when X is exact); every retained hash below θ is a
#     uniform sample of the underlying domain, so
#     |A ∩ B| ≈ |A∩B ∩ [0,θ)| · D/θ and Jaccard ≈ the in-sample ratio.
#
# The hash is the same engine-agnostic two-base 62-bit polynomial the
# deterministic HLL uses (hll_deterministic above), so states,
# estimates, AND the intersection arithmetic are bit-identical across
# Spark and DuckDB — every query built on this is hash-checkable.
# Plan shape: one map-side-partial DISTINCT aggregate (Spark prunes
# duplicates before the exchange, so the shuffle carries per-partition
# distinct hashes only — the same exchange any COUNT(DISTINCT) pays)
# followed by TakeOrderedAndProject(k) (per-partition top-k, k-row
# merge). The k-row state is what an incremental warehouse persists
# per batch; relative error ~ 1/√(k−2) ≈ 6.3% at k=256.

KMV_K = 256
# h = a·2³¹ + b with a, b ∈ [0, 2³¹−2]: domain ≈ [0, M·2³¹) with
# M = 2³¹−1. D = M·2³¹ = 4611686016279904256 (< 2⁶³, fits BIGINT).
_KMV_DOMAIN = 2_147_483_647 * 2_147_483_648


def _hash62_int(key_col: str):
    """The hll_deterministic two-base integer hash as a Column (same
    spelling, shared by the KMV family; DuckDB twin: kmv_hash_sql)."""
    x = F.pmod(F.col(key_col).cast("long"), F.lit(_HLL_MOD))
    return (x * F.lit(2_654_435_761) % F.lit(_HLL_MOD)) * F.lit(
        2_147_483_648
    ) + (x * F.lit(40_503) + F.lit(12_345)) % F.lit(_HLL_MOD)


def kmv_hash_sql(v: str) -> str:
    """DuckDB spelling of _hash62_int (the _HLL_MONTHLY_SQL idiom)."""
    p = f"((({v}) % 2147483647) + 2147483647) % 2147483647"
    return (
        f"({p} * 2654435761 % 2147483647) * 2147483648"
        f" + ({p} * 40503 + 12345) % 2147483647"
    )


def kmv_state(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """KMV state: the k smallest distinct 62-bit hashes of `key_col`
    (column ``h``). NULL keys are ignored (they carry no identity)."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(_hash62_int(key_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*states: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge KMV states: union ∘ distinct ∘ k-smallest. EXACTLY equals
    the state built on the concatenated inputs (see module note), so
    per-batch states compose across days/partitions/replays."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.distinct().orderBy("h").limit(k)


def kmv_finalize(state: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from a KMV state: exact below k,
    (k−1)·D DIV h_(k) at capacity (all-integer — DECIMAL(38,0)
    intermediate, one floor). Output: (k, n_state, kth_hash,
    est_distinct)."""
    s = state.agg(
        F.count(F.lit(1)).cast("long").alias("n_state"),
        F.max("h").alias("kth_hash"),
    )
    return s.select(
        F.lit(k).cast("int").alias("k"),
        "n_state",
        "kth_hash",
        F.when(F.col("n_state") < k, F.col("n_state"))
        .otherwise(
            F.expr(
                f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {_KMV_DOMAIN}"
                f" DIV kth_hash AS BIGINT)"
            )
        )
        .alias("est_distinct"),
    )


def theta_intersect(
    state_a: DataFrame, state_b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Theta combine of two KMV states: intersection / union / Jaccard
    estimates from the shared uniform sample below θ = min(θ_A, θ_B).
    Exact (θ = D) whenever both inputs hold fewer than k values. All
    arithmetic is integer (DECIMAL(38,0) DIV), so the output is
    hash-checkable cross-engine. The states are k-row tables: the
    joins below are broadcast-size by construction. Output:
    (theta_hash, n_union_sample, n_inter_sample, est_union,
    est_intersect, jaccard_ppm)."""
    ta = state_a.agg(
        F.count(F.lit(1)).alias("n_a"), F.max("h").alias("m_a")
    )
    tb = state_b.agg(
        F.count(F.lit(1)).alias("n_b"), F.max("h").alias("m_b")
    )
    th = ta.crossJoin(tb).select(
        F.least(
            F.when(F.col("n_a") < k, F.lit(_KMV_DOMAIN)).otherwise(
                F.col("m_a")
            ),
            F.when(F.col("n_b") < k, F.lit(_KMV_DOMAIN)).otherwise(
                F.col("m_b")
            ),
        ).alias("theta_hash")
    )

    def _below(df: DataFrame) -> DataFrame:
        return df.crossJoin(F.broadcast(th)).filter(
            F.col("h") < F.col("theta_hash")
        )

    u = _below(state_a.unionByName(state_b).distinct()).agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sample")
    )
    c = _below(state_a.join(state_b, "h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_inter_sample")
    )
    est = (
        lambda n: F.expr(
            f"CAST(CAST({n} AS DECIMAL(38,0)) * {_KMV_DOMAIN}"
            f" DIV theta_hash AS BIGINT)"
        )
    )
    return (
        u.crossJoin(c)
        .crossJoin(th)
        .select(
            "theta_hash",
            "n_union_sample",
            "n_inter_sample",
            est("n_union_sample").alias("est_union"),
            est("n_inter_sample").alias("est_intersect"),
            F.when(
                F.col("n_union_sample") > 0,
                F.expr(
                    "CAST(n_inter_sample * 1000000"
                    " DIV n_union_sample AS BIGINT)"
                ),
            ).alias("jaccard_ppm"),
        )
    )


def kmv_oracle_sql(src: str, val: str, k: int = KMV_K) -> str:
    """DuckDB twin of kmv_state ∘ kmv_finalize over `val` from `src`
    (a table name or parenthesized subquery)."""
    return f"""
        WITH hh AS (
            SELECT DISTINCT {kmv_hash_sql(val)} AS h
            FROM {src} WHERE {val} IS NOT NULL
        ), kk AS (
            SELECT h FROM hh ORDER BY h LIMIT {k}
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_state,
                   MAX(h) AS kth_hash
            FROM kk
        )
        SELECT CAST({k} AS INT) AS k, n_state, kth_hash,
               CASE WHEN n_state < {k} THEN n_state
                    ELSE CAST(CAST({k - 1} AS HUGEINT) * {_KMV_DOMAIN}
                              // kth_hash AS BIGINT)
               END AS est_distinct
        FROM s
        """


def theta_intersect_sql(
    src_a: str, src_b: str, val: str, k: int = KMV_K
) -> str:
    """DuckDB twin of kmv_state×2 ∘ theta_intersect."""
    d = _KMV_DOMAIN

    def half(name: str, src: str) -> str:
        return f"""
        {name}_h AS (
            SELECT DISTINCT {kmv_hash_sql(val)} AS h
            FROM {src} WHERE {val} IS NOT NULL
        ), {name}_k AS (
            SELECT h FROM {name}_h ORDER BY h LIMIT {k}
        ), {name}_s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS m
            FROM {name}_k
        )"""

    return f"""
        WITH {half('a', src_a)}, {half('b', src_b)},
        th AS (
            SELECT LEAST(
                CASE WHEN a_s.n < {k} THEN {d} ELSE a_s.m END,
                CASE WHEN b_s.n < {k} THEN {d} ELSE b_s.m END
            ) AS theta_hash
            FROM a_s, b_s
        ), un AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_union_sample
            FROM (SELECT h FROM a_k UNION SELECT h FROM b_k) u, th
            WHERE u.h < th.theta_hash
        ), ic AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_inter_sample
            FROM a_k JOIN b_k USING (h), th
            WHERE a_k.h < th.theta_hash
        )
        SELECT th.theta_hash, n_union_sample, n_inter_sample,
               CAST(CAST(n_union_sample AS HUGEINT) * {d}
                    // theta_hash AS BIGINT) AS est_union,
               CAST(CAST(n_inter_sample AS HUGEINT) * {d}
                    // theta_hash AS BIGINT) AS est_intersect,
               CASE WHEN n_union_sample > 0 THEN
                 CAST(n_inter_sample * 1000000 // n_union_sample
                      AS BIGINT)
               END AS jaccard_ppm
        FROM th, un, ic
        """


def theta_difference(
    state_a: DataFrame, state_b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Theta A-NOT-B: estimate |A ∖ B| from two KMV states — "did X
    but never Y", the other set question distinct-count state usually
    cannot answer. Same sample argument as theta_intersect: below
    θ = min(θ_A, θ_B) the retained hashes are a uniform sample, so
    |A∖B| ≈ |{h ∈ A, h ∉ B, h < θ}| · D/θ, exact when both sides are
    below capacity. Output: (theta_hash, n_a_sample, n_diff_sample,
    est_a, est_difference)."""
    ta = state_a.agg(
        F.count(F.lit(1)).alias("n_a"), F.max("h").alias("m_a")
    )
    tb = state_b.agg(
        F.count(F.lit(1)).alias("n_b"), F.max("h").alias("m_b")
    )
    th = ta.crossJoin(tb).select(
        F.least(
            F.when(F.col("n_a") < k, F.lit(_KMV_DOMAIN)).otherwise(
                F.col("m_a")
            ),
            F.when(F.col("n_b") < k, F.lit(_KMV_DOMAIN)).otherwise(
                F.col("m_b")
            ),
        ).alias("theta_hash")
    )

    def _below(df: DataFrame) -> DataFrame:
        return df.crossJoin(F.broadcast(th)).filter(
            F.col("h") < F.col("theta_hash")
        )

    na = _below(state_a).agg(
        F.count(F.lit(1)).cast("long").alias("n_a_sample")
    )
    nd = _below(
        state_a.join(state_b, "h", "left_anti")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_diff_sample"))
    est = (
        lambda n: F.expr(
            f"CAST(CAST({n} AS DECIMAL(38,0)) * {_KMV_DOMAIN}"
            f" DIV theta_hash AS BIGINT)"
        )
    )
    return (
        na.crossJoin(nd)
        .crossJoin(th)
        .select(
            "theta_hash",
            "n_a_sample",
            "n_diff_sample",
            est("n_a_sample").alias("est_a"),
            est("n_diff_sample").alias("est_difference"),
        )
    )


def theta_difference_sql(
    src_a: str, src_b: str, val: str, k: int = KMV_K
) -> str:
    """DuckDB twin of kmv_state×2 ∘ theta_difference."""
    d = _KMV_DOMAIN

    def half(name: str, src: str) -> str:
        return f"""
        {name}_h AS (
            SELECT DISTINCT {kmv_hash_sql(val)} AS h
            FROM {src} WHERE {val} IS NOT NULL
        ), {name}_k AS (
            SELECT h FROM {name}_h ORDER BY h LIMIT {k}
        ), {name}_s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS m
            FROM {name}_k
        )"""

    return f"""
        WITH {half('a', src_a)}, {half('b', src_b)},
        th AS (
            SELECT LEAST(
                CASE WHEN a_s.n < {k} THEN {d} ELSE a_s.m END,
                CASE WHEN b_s.n < {k} THEN {d} ELSE b_s.m END
            ) AS theta_hash
            FROM a_s, b_s
        ), na AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_a_sample
            FROM a_k, th WHERE a_k.h < th.theta_hash
        ), nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_diff_sample
            FROM a_k, th
            WHERE a_k.h < th.theta_hash
              AND a_k.h NOT IN (SELECT h FROM b_k)
        )
        SELECT th.theta_hash, n_a_sample, n_diff_sample,
               CAST(CAST(n_a_sample AS HUGEINT) * {d}
                    // theta_hash AS BIGINT) AS est_a,
               CAST(CAST(n_diff_sample AS HUGEINT) * {d}
                    // theta_hash AS BIGINT) AS est_difference
        FROM th, na, nd
        """


# --- weighted reservoir sampling, A-ES (r10) ---------------------------------
#
# Efraimidis & Spirakis 2006 (algorithm A-ES): give every item the
# priority u^(1/w) with u ~ Uniform(0,1) and keep the top-n — the
# selection probability is then proportional to weight, and the
# n-row priority state is MERGEABLE: top-n(A ∪ B) ==
# top-n(top-n(A) ∪ top-n(B)), the same bottom-k law as KMV (the
# priority is a pure function of (key, weight), so partial states
# from batches/partitions/replays compose exactly).
#
# Engine-shared determinism: u is hash-derived (the KMV 62-bit
# integer hash, u ≈ (h+1)/D), and the ordering key is the exact
# fixed-point −log₂(u)/w: minimizing cost/w == maximizing u^(1/w).
# cost is the Q16 shift-and-square log (functions/text.py::
# _log2_q16_sql — no libm), and the division by w is one integer
# DIV at Q20, so both engines materialize the identical priority
# column and the identical sample.

ARES_PRIORITY_SCALE = 1_048_576  # Q20: priority = cost_q16·2²⁰ DIV w


def _ares_priority(key_col: str, weight_col: str):
    """priority_q = (−log₂ u)·2³⁶ DIV w as an exact integer Column:
    u = (h+1)/D from the KMV hash (never 0), cost_q16 =
    log₂(D/(h+1)) ∈ [0, 62·2¹⁶]; · 2²⁰ stays < 2⁴³ — no overflow."""
    from ..functions.text import _log2_q16_sql

    h1 = _hash62_int(key_col) + F.lit(1)
    cost = F.expr(
        _log2_q16_sql(str(_KMV_DOMAIN), "__h1")
    )
    return h1, cost


def weighted_sample_ares(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int = 100,
) -> DataFrame:
    """A-ES state: the n highest-priority (key, weight) rows, with
    the priority materialized so states merge. Preconditions: keys
    identify rows (duplicate keys collapse to one candidate — their
    priority is identical by construction), integer weights ≥ 1
    (NULL/non-positive rows are excluded — zero weight means never
    sample). Output: (key, weight, priority_q), priority ASC = most
    preferred first; ties broken on key for a total order."""
    # r10: the dedup exchange is EXPLICIT (repartition on the grouping
    # keys, cluster width) instead of distinct()'s ENSURE_REQUIREMENTS
    # exchange, which AQE's size-based coalescing collapses to ONE
    # task at entity scale (the state is a few MB) — serializing the
    # 16-round log recurrence below onto a single core. Same exchange
    # count (dropDuplicates reuses the partitioning); a cluster-scale
    # input keeps cluster-width tasks either way.
    base = (
        df.select(
            F.col(key_col).cast("long").alias("__k"),
            F.col(weight_col).cast("long").alias("__w"),
        )
        .filter(F.col("__k").isNotNull() & (F.col("__w") >= 1))
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "__k", "__w"
        )
        .dropDuplicates()
    )
    h1, cost = _ares_priority("__k", "__w")
    scored = base.withColumn("__h1", h1).select(
        "__k",
        "__w",
        (cost * F.lit(ARES_PRIORITY_SCALE)).alias("__c"),
    )
    return (
        scored.select(
            F.col("__k").alias("key"),
            F.col("__w").alias("weight"),
            F.expr("__c DIV __w").alias("priority_q"),
        )
        .orderBy(F.asc("priority_q"), F.asc("key"))
        .limit(n)
    )


def ares_merge(*states: DataFrame, n: int = 100) -> DataFrame:
    """Merge A-ES states: union ∘ distinct ∘ top-n. EXACTLY equals
    the state built on the concatenated inputs (the KMV bottom-k
    law; distinct collapses keys seen by several partials — their
    rows are identical because the priority is a pure function of
    (key, weight))."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return (
        merged.distinct()
        .orderBy(F.asc("priority_q"), F.asc("key"))
        .limit(n)
    )


def ares_oracle_sql(
    src: str, key_expr: str, weight_expr: str, n: int = 100
) -> str:
    """DuckDB twin of weighted_sample_ares over `src`: the KMV hash
    (kmv_hash_sql), the 16-round Q16 log recurrence unrolled as
    chained CTEs (the lm_perplexity_oracle_sql technique), one Q20
    integer division by the weight, same (priority, key) order."""
    steps = []
    for i in range(1, 17):
        steps.append(
            f""", s{i} AS (
            SELECT k, w,
                   CASE WHEN ((x * x) >> 29) >= 1073741824
                        THEN ((x * x) >> 29) >> 1
                        ELSE ((x * x) >> 29) END AS x,
                   acc * 2 + CASE WHEN ((x * x) >> 29) >= 1073741824
                                  THEN 1 ELSE 0 END AS acc,
                   e
            FROM s{i - 1}
        )"""
        )
    d = _KMV_DOMAIN
    return (
        f"""
        WITH base AS (
            SELECT DISTINCT CAST({key_expr} AS BIGINT) AS k,
                   CAST({weight_expr} AS BIGINT) AS w
            FROM {src}
            WHERE {key_expr} IS NOT NULL
              AND CAST({weight_expr} AS BIGINT) >= 1
        ), hh AS (
            SELECT k, w, {kmv_hash_sql('k')} + 1 AS h1 FROM base
        ), me AS (
            SELECT k, w, h1,
                   (length(bin({d})) - length(bin(h1)))
                   - CASE WHEN (h1 << (length(bin({d}))
                                       - length(bin(h1)))) > {d}
                          THEN 1 ELSE 0 END AS e
            FROM hh
        ), s0 AS (
            SELECT k, w,
                   CAST(CAST({d} AS HUGEINT) * 536870912
                        // (CAST(h1 AS HUGEINT)
                            * (CAST(1 AS BIGINT) << e))
                        AS BIGINT) AS x,
                   CAST(0 AS BIGINT) AS acc,
                   e
            FROM me
        )"""
        + "".join(steps)
        + f"""
        SELECT k AS key, w AS weight,
               CAST((CAST(e AS BIGINT) * 65536 + acc)
                    * {ARES_PRIORITY_SCALE} // w AS BIGINT)
                 AS priority_q
        FROM s16
        ORDER BY priority_q ASC, key ASC
        LIMIT {n}
        """
    )
