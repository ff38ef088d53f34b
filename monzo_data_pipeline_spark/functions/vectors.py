"""Vector functions over array<float> embedding columns — SURVEY.md
§2.C3 and the north-star similarity-search operators.

Dot products / norms are expressed with higher-order functions
(F.zip_with + F.aggregate) — JVM-side, no Python, no UDF. The
accumulator is double and folds left-to-right over the array, which
is deterministic for a fixed array (same result every run/engine
that folds sequentially — DuckDB's list_dot_product does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision (sequential fold)."""
    prod = F.zip_with(_as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (0 when either vector is zero)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
