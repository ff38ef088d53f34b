"""Deterministic aggregation helpers for cross-engine comparability.

Problem: ``SUM(double)`` is order-dependent — Spark's partial/final
aggregation adds in shuffle order, DuckDB adds in its own order, so
the low bits (and hash checks) can diverge. At 100 TB with thousands
of partial aggregates this is guaranteed, not hypothetical.

Policy: aggregate money-like doubles in DECIMAL (exact, associative,
order-independent), then cast the final result to double. This costs
one cast per row — still whole-stage-codegen'd JVM arithmetic, no
Python — and makes every sum/avg bit-identical regardless of
partitioning, parallelism, or engine.

The matching oracle-SQL idiom (DuckDB) is::

    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)

This mirrors the reference's integer-pence money policy
(/root/reference/src/sql/create_bronze_layer.sql:4): money is exact
in storage and aggregation, floating only at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DECIMAL = "decimal(18,2)"


def dsum(col: Column | str, scale: str = MONEY_DECIMAL) -> Column:
    """Order-independent SUM over a double column: sum in decimal, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def davg(col: Column | str, scale: str = MONEY_DECIMAL) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)


def oracle_dsum(expr: str, scale: str = "DECIMAL(18,2)") -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE)"


def oracle_davg(expr: str, scale: str = "DECIMAL(18,2)") -> str:
    """DuckDB twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) / COUNT({expr})"
