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
