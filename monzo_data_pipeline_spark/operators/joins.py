"""Join operators.

Covers SURVEY.md §2 rows B2 (broadcast enrichment join), B3
(analytical FK joins), A11's anti-join lives in dedup.py.

Scale notes: dimension tables (region=5, nation=25, currency rates
≈ tens of rows — and their 100 TB-scale equivalents are still ≤ GBs)
are explicitly `broadcast()`-hinted: the fact side never shuffles for
the join. Fact-to-fact joins (orders⋈lineitem) shuffle on the join
key; AQE converts to broadcast at runtime when a filtered side turns
out small, and splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, list[str] | str]],
    how: str = "left",
    broadcast_dims: bool = True,
) -> DataFrame:
    """B3 — star-schema fact→dimension joins.

    Reference declares the FKs (create_silver_layer.sql:17-18) but
    never executes a join; this is the analytical join they imply.
    Every dim is broadcast (no fact shuffle) unless told otherwise.
    """
    out = fact
    for dim, on in dims:
        dim_side = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(dim_side, on=on, how=how)
    return out


def enrich_with_rates(
    tx: DataFrame,
    rates: DataFrame,
    amount_col: str,
    currency_col: str,
    rate_col: str = "rate",
) -> DataFrame:
    """B2 — FX-rate enrichment (reference notebooks/currency_ex_rate_api.ipynb):
    broadcast-join the (tiny) rates table and convert to base currency."""
    return tx.join(F.broadcast(rates), on=currency_col, how="left").withColumn(
        "base_amount", F.col(amount_col) * F.col(rate_col)
    )
