"""Scalar column functions — SURVEY.md §2 rows A19-A22, A21/C5 JSON.

All built-in pyspark.sql.functions (JVM codegen, no Python): the
reference does each of these row-at-a-time in host Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def abs_amount(col: Column | str) -> Column:
    """A19 — reference: `abs(data['spend_today'])` (api_client.py:219)."""
    return F.abs(F.col(col) if isinstance(col, str) else col)


def array_to_json(col: Column | str) -> Column:
    """A20 — reference: `json.dumps(merchant_suggested_tags)` (load.py:117)."""
    return F.to_json(F.col(col) if isinstance(col, str) else col)


def json_get(col: Column | str, path: str) -> Column:
    """A21 — JSON field access; the reference round-trips through
    json.loads/json.dumps to read counterparty fields
    (api_client.py:53-55). `path` is a '$.field' JSONPath."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def parse_json_typed(col: Column | str, schema: T.StructType | str) -> Column:
    """A21/C5 — typed JSON parse (from_json): one pass, all fields, a
    real struct column downstream ops can flatten (operators/projection.py)."""
    return F.from_json(F.col(col) if isinstance(col, str) else col, schema)


def iso_format(col: Column | str, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """A22 — timestamp→string (reference isoformat(), api_client.py:179-187)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, fmt)


def iso_parse(col: Column | str) -> Column:
    """A22 — ISO-8601 string→timestamp (reference stores ISO strings,
    load.py:47)."""
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col)
