"""Filter / limit operators.

Covers SURVEY.md §2 rows A9 (range predicate), A10 (limit), A24
(sort-desc latest read).

Scale note: every filter here is a Catalyst-pushable predicate —
``.explain`` must show it under PushedFilters on the parquet scan. On
a date-partitioned 100 TB table the same predicate becomes partition
pruning (directories never listed). The reference's analog is pushing
`since`/`before` into the REST request (api_client.py:177-187) —
source-side filtering, same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_range_filter(
    df: DataFrame,
    date_col: str,
    since: str | None = None,
    before: str | None = None,
) -> DataFrame:
    """A9 — keep rows with since <= date_col < before (either bound optional).

    Reference: extract.py:18 computes `since = now() - 30 days` and
    ships it to the API; the declarative equivalent is a plain
    predicate that Catalyst pushes to the scan.
    """
    out = df
    if since is not None:
        out = out.filter(F.col(date_col) >= F.lit(since).cast("timestamp"))
    if before is not None:
        out = out.filter(F.col(date_col) < F.lit(before).cast("timestamp"))
    return out


def top_k(df: DataFrame, order_cols: list[str], k: int, ascending: bool = False) -> DataFrame:
    """A10+A24 — deterministic LIMIT: total order (with tiebreak cols
    supplied by the caller) then take k.

    Spark plans this as TakeOrderedAndProject — a per-partition top-k
    heap + single-driver merge of k·partitions rows, NOT a global
    sort. That is the 100 TB-safe shape of "give me the latest/largest
    k"; a bare .limit() without order is nondeterministic under
    parallelism and an ORDER BY without LIMIT is a full shuffle.
    """
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols]
    return df.orderBy(*cols).limit(k)


def latest_snapshot(df: DataFrame, ts_col: str, tiebreak: list[str] | None = None, k: int = 1) -> DataFrame:
    """A24 — the reference's latest-snapshot read (`ORDER BY
    date_retrieved DESC`, query_sqlite_db.ipynb cell 4) as top-k."""
    return top_k(df, [ts_col, *(tiebreak or [])], k=k, ascending=False)


def source_mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    mod: int = 97,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic data mixing: downsample each source to a target
    rate (keep rows with ``id % mod < rates[source]``, i.e. a
    rate of rates[source]/mod) — the corpus-reweighting step of a
    training-data pipeline (e.g. cap low-quality crawl at 10%, keep
    curated sources whole).

    Keyed modular sampling, not rand()/TABLESAMPLE: the selected SET
    is a pure function of the row, so it is reproducible across runs,
    partitionings, and engines (oracle-checkable), and a re-run after
    appends keeps every previously selected row — the sample is
    incrementally stable. Unlisted sources are dropped (explicit
    mixture). The rates literal compiles into the plan as a CASE
    chain — no join, fully pushdown-eligible."""
    keep = None
    for src, r in rates.items():
        cond = F.col(source_col) == src
        keep = cond & (F.col(id_col) % mod < r) if keep is None else keep | (
            cond & (F.col(id_col) % mod < r)
        )
    return df.filter(keep)


def weighted_priority_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    k: int = 100,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: each row
    gets priority ``hash(key)·10⁶ DIV weight`` (Knuth multiplicative
    hash, pseudo-uniform in [0, 2³¹)) and the k smallest priorities
    win — heavier rows draw proportionally smaller priorities, the
    integer twin of the Efraimidis–Spirakis A-ES exponential-jump
    sampler (u^(1/w) order statistics), with the keyed hash replacing
    rand() so the selected SET is a pure function of the data:
    reproducible across runs, partitionings, and engines, and
    incrementally stable under appends.

    Plan: one map-side projection + TakeOrderedAndProject (per-
    partition top-k, k-sized merge on the driver) — no global sort,
    no shuffle of the fact. Weight should be a positive integer
    column (quantize money via floor(x·100+0.5) cents first); rows
    with weight <= 0 are excluded — a zero weight would otherwise
    make the priority NULL (div-by-zero) and NULLs sort FIRST under
    Spark's ascending ordering, guaranteeing invalid rows win the
    sample. The hash is pmod'd so negative keys keep a non-negative
    priority domain (a negative hash would invert the weighting)."""
    staged = df.select(
        F.col(key_col),
        weight.cast("long").alias("weight"),
        (
            F.pmod(F.col(key_col), F.lit(2_147_483_647))
            * F.lit(2_654_435_761)
            % F.lit(2_147_483_647)
            * F.lit(1_000_000)
        ).alias("_hash6"),
    )
    return (
        staged.filter(F.col("weight") > 0)
        .select(
            key_col, "weight", F.expr("_hash6 DIV weight").alias("priority")
        )
        .orderBy(F.asc("priority"), F.asc(key_col))
        .limit(k)
    )
