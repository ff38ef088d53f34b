"""Z-order (Morton) layout AUDIT — oracle-checkable clustering keys.

The layout WRITER lives in `sources/io.py::write_zordered` (min/max-
or equi-depth-normalized bit interleave → repartitionByRange → per-
file sort; skip-tested on both columns in tests/test_sources.py).
This module is its hash-checkable companion: a pure-integer Morton
key whose arithmetic is IDENTICAL in Spark and DuckDB (one expression
builder, two dialect spellings — the sketches.py pattern), so the
layout audit itself sits under the cross-engine correctness gate.

`zorder_layout_stats` answers the question a 100 TB table owner asks
before and after an OPTIMIZE ZORDER: bucketed by prospective file
boundary (the top key bits), what rectangle of each dimension does
each file cover? Bounded rectangles on every dimension == min/max
file skipping works on any filter column; a single-column sort shows
full-range rows on every other dimension. All exact integer shifts —
no normalization pass — so the audit is deterministic and carries a
DuckDB twin built from the same expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 21 bits per dimension: two dims interleave into 42 bits, three into
# 63 — always inside a non-negative BIGINT
ZORDER_BITS = 21
_MASK = (1 << ZORDER_BITS) - 1


def _shl(x: str, n: int, dialect: str) -> str:
    return (
        f"SHIFTLEFT({x}, {n})" if dialect == "spark" else f"(({x}) << {n})"
    )


def _shr(x: str, n: int, dialect: str) -> str:
    return (
        f"SHIFTRIGHT({x}, {n})" if dialect == "spark" else f"(({x}) >> {n})"
    )


def zorder_key_expr(cols: list[str], dialect: str = "spark") -> str:
    """SQL expression interleaving the low ``ZORDER_BITS`` bits of each
    column (already masked/non-negative — see `zorder_dim_expr`) into
    one Morton key: column j contributes its bit i at position
    i·len(cols)+j. Bit lanes are disjoint, so the sum IS the bitwise
    OR; everything is shifts and masks — identical arithmetic in both
    dialects."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(ZORDER_BITS):
            bit = f"({_shr(c, i, dialect)} & 1)"
            terms.append(_shl(bit, i * k + j, dialect))
    return "(" + " + ".join(terms) + ")"


def zorder_dim_expr(col: str, dialect: str = "spark") -> str:
    """Map an arbitrary BIGINT column into the non-negative
    ``ZORDER_BITS``-bit domain (floor-mod, identical in both engines
    via the double-pmod spelling)."""
    m = _MASK + 1
    return f"((({col}) % {m} + {m}) % {m})"


def zorder_layout_stats(
    df: DataFrame, x_col: str, y_col: str, coarse_bits: int = 10
) -> DataFrame:
    """Layout AUDIT: bucket rows by the top ``coarse_bits`` of their
    2-D Morton key (what a file boundary would be under
    `zorder_sort`) and report each bucket's per-dimension min/max —
    the bounded-rectangle property that makes file skipping work on
    both dimensions at once. Output: (bucket, n, min_x, max_x,
    min_y, max_y), one shuffle of ≤ 2^coarse_bits groups."""
    dx = zorder_dim_expr(x_col)
    dy = zorder_dim_expr(y_col)
    z = zorder_key_expr([dx, dy])
    shift = 2 * ZORDER_BITS - coarse_bits
    return (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.expr(f"SHIFTRIGHT({z}, {shift})").cast("long").alias("bucket"),
            F.expr(dx).cast("long").alias("__x"),
            F.expr(dy).cast("long").alias("__y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__x").alias("min_x"),
            F.max("__x").alias("max_x"),
            F.min("__y").alias("min_y"),
            F.max("__y").alias("max_y"),
        )
        .orderBy("bucket")
    )


def zorder_layout_sql(
    src: str, x_sql: str, y_sql: str, coarse_bits: int = 10
) -> str:
    """DuckDB oracle twin of `zorder_layout_stats` over relation
    ``src`` with dimension expressions ``x_sql``/``y_sql`` — built
    from the same expression builders."""
    dx = zorder_dim_expr(x_sql, "duckdb")
    dy = zorder_dim_expr(y_sql, "duckdb")
    z = zorder_key_expr([dx, dy], "duckdb")
    shift = 2 * ZORDER_BITS - coarse_bits
    return f"""
    SELECT CAST(({z}) >> {shift} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN({dx}) AS BIGINT) AS min_x,
           CAST(MAX({dx}) AS BIGINT) AS max_x,
           CAST(MIN({dy}) AS BIGINT) AS min_y,
           CAST(MAX({dy}) AS BIGINT) AS max_y
    FROM {src}
    WHERE ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """


# --- shard rebalance audit (r9) ----------------------------------------------

# Rendezvous (HRW) weights: per (key, shard) score from the same
# Carter-Wegman family as the deterministic sketches; a key lives on
# the argmax-score shard, so adding a shard steals only the keys whose
# new shard wins — the ~1/(N+1) movement bound consistent placement
# exists for (Thaler & Ravishankar 1998).
_HRW_P = 2_147_483_647
_HRW_A = 1_103_515_245
_HRW_B = 40_503


def _hrw_score(key_expr: str, shard: str) -> str:
    """Engine-shared HRW score SQL: mix key and shard id through two
    multiplicative rounds mod the 2³¹−1 prime (exact in int64:
    operands < 2³¹, products < 2⁶²). The key is folded with the
    pmod-equivalent ((x % P + P) % P) so NEGATIVE keys score
    identically in Spark and DuckDB — both engines' bare `%` is
    sign-preserving (r10 fix); the outer rounds then stay
    non-negative by construction."""
    k = f"((({key_expr}) % {_HRW_P} + {_HRW_P}) % {_HRW_P})"
    return (
        f"(({k} * {_HRW_A} + ({shard}) * {_HRW_B}"
        f" + 12345) % {_HRW_P} * 69069 + 1) % {_HRW_P}"
    )


def shard_rebalance_audit(
    df, key_col: str, n_shards: int, n_shards_new: int
):
    """How many keys MOVE when the shard count changes — the
    data-layout question behind every repartition/resharding decision
    at 100 TB: modulo placement (`key % N`) moves ~N/(N+1) of all
    keys on N→N+1 (a full-cluster rewrite), rendezvous/HRW placement
    moves only the keys the NEW shard wins (~1/(N+1)). Both
    placements are computed exactly for the table's distinct keys and
    compared; output is one row (n_keys, moved_modulo, moved_hrw).

    HRW per key = argmax over shards of the CW score (ties broken by
    lower shard id — deterministic); the argmax over the OLD shard
    set is unchanged by adding shards unless a new shard's score
    wins, which is what makes the movement minimal. Plan: distinct
    keys × (n_shards_new) scores — a bounded explode, one aggregate;
    no shuffle beyond the distinct."""
    from pyspark.sql import functions as F

    keys = (
        df.select(F.col(key_col).cast("long").alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
    )
    # score over the UNION of both shard sets so the audit is correct
    # in both directions: on a shrink (n_shards_new < n_shards) the
    # OLD argmax still needs every old shard's score; each argmax
    # below restricts to its own shard count via FILTER (r10 fix)
    n_shards_max = max(n_shards, n_shards_new)
    shards = F.explode(
        F.sequence(F.lit(0), F.lit(n_shards_max - 1))
    ).alias("__s")
    scored = keys.select("__k", shards).select(
        "__k",
        "__s",
        F.expr(_hrw_score("__k", "__s")).alias("__score"),
    )

    def argmax(limit_col: str):
        # max_by with a deterministic integer tie-break (max score,
        # then LOWER shard id): maximize score·1024 − shard — unique
        # per (score, shard) for shard counts ≤ 1024, identical
        # arithmetic in the DuckDB twin's arg_max
        return F.expr(
            f"max_by(__s, __score * 1024 - __s)"
            f" FILTER (WHERE __s < {limit_col})"
        )

    placed = scored.groupBy("__k").agg(
        argmax(str(n_shards)).alias("__old_hrw"),
        argmax(str(n_shards_new)).alias("__new_hrw"),
    )
    return placed.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            (
                F.pmod(F.col("__k"), F.lit(n_shards))
                != F.pmod(F.col("__k"), F.lit(n_shards_new))
            ).cast("long")
        ).alias("moved_modulo"),
        F.sum(
            (F.col("__old_hrw") != F.col("__new_hrw")).cast("long")
        ).alias("moved_hrw"),
    )
