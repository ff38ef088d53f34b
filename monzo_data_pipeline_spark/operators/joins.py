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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    right_vals: list[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right.ts <= left.ts, per `by` key. (The reference's latest-snapshot
    read, query_sqlite_db.ipynb cell 4, is the degenerate single-key
    form; Spark has no native ASOF operator, so this is the classic
    union + running-last-value composition.)

    ``direction`` (pandas merge_asof parity, r8): "backward" (default)
    matches the latest right row at-or-before each left row;
    "forward" matches the EARLIEST right row at-or-after it — same
    one-window plan with the traversal order reversed; "nearest"
    takes whichever of the two sits closer in time (ties → backward,
    the earlier row) — BOTH fills run over the SAME key exchange (two
    Window sort orders, one hash partitioning: one shuffle, two
    in-partition sorts). ``tolerance`` (a Column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``) bounds how far the match may sit
    from the left timestamp: beyond it the row keeps left-join
    semantics with NULL right values; under "nearest" each candidate
    side is tolerance-tested before the choice.

    Plan shape: tag both sides, union (zero-shuffle), ONE window
    shuffle on the `by` key ordered by (ts, side) — right rows sort
    before left rows at equal ts so an exactly-simultaneous snapshot
    matches. last_value(ignorenulls) propagates each right value
    forward; filtering back to left rows yields the join. Cost: one
    shuffle of |L|+|R| rows — no range-explosion, no per-row probe; at
    100 TB both sides partition by the key and AQE splits skewed keys.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    l_tag = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_vals],
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
    )
    r_tag = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in by and c != ts_col
        ],
    )
    carry = list(right_vals)
    if tolerance is not None or direction == "nearest":
        # carry the MATCHED right timestamp so the distance test (and
        # the nearest choice) can run after the fill — one extra
        # window column, no extra pass
        l_tag = l_tag.withColumn(
            "__r___mts", F.lit(None).cast(dict(right.dtypes)[ts_col])
        )
        r_tag = r_tag.withColumn("__r___mts", F.col("__ts"))
        carry = carry + ["__mts"]

    def _window(d: str) -> Window:
        ts_order = (
            F.col("__ts").asc() if d == "backward" else F.col("__ts").desc()
        )
        return (
            Window.partitionBy(*by)
            .orderBy(ts_order, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _in_tol(d: str, mts: str):
        if tolerance is None:
            return F.lit(True)
        return (
            F.col(mts) >= F.col("__ts") - tolerance
            if d == "backward"
            else F.col(mts) <= F.col("__ts") + tolerance
        )

    unioned = r_tag.unionByName(l_tag)
    if direction != "nearest":
        w = _window(direction)
        filled = unioned.select(
            "*",
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
                for c in carry
            ],
        )
        if tolerance is not None:
            in_tol = _in_tol(direction, "__mts")
            filled = filled.select(
                *[c for c in filled.columns if c not in right_vals],
                *[
                    F.when(in_tol, F.col(c)).alias(c)
                    for c in right_vals
                ],
            )
    else:
        wb, wf = _window("backward"), _window("forward")
        filled = unioned.select(
            "*",
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in carry
            ],
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in carry
            ],
        )
        b_ok = F.col("__b___mts").isNotNull() & _in_tol(
            "backward", "__b___mts"
        )
        f_ok = F.col("__f___mts").isNotNull() & _in_tol(
            "forward", "__f___mts"
        )
        # nearest: both valid → smaller distance wins, ties → backward
        use_b = b_ok & (
            ~f_ok
            | (
                F.col("__ts") - F.col("__b___mts")
                <= F.col("__f___mts") - F.col("__ts")
            )
        )
        filled = filled.select(
            *[c for c in filled.columns],
            *[
                F.when(use_b, F.col(f"__b_{c}"))
                .otherwise(F.when(f_ok, F.col(f"__f_{c}")))
                .alias(c)
                for c in right_vals
            ],
        )
    keep = (
        by
        + [c for c in left.columns if c not in by and c != ts_col]
        + right_vals
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .withColumnRenamed("__ts", ts_col)
        .select(ts_col, *keep)
    )


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


def band_join(
    points: DataFrame,
    point_col: str,
    band_width: float,
    bands: DataFrame,
    band_lo_col: str = "band_lo",
) -> DataFrame:
    """Range join (point-in-interval) on a fixed-width grid, rewritten
    as an equi-join.

    The naive plan for `p.v >= b.lo AND p.v < b.hi` is a nested-loop
    join — O(points × bands), catastrophic at scale. When the bands
    are aligned to a fixed width, the band a point falls into is pure
    arithmetic (`floor(v / width)`), so the range predicate collapses
    to an equi-join on the computed band id: hash/broadcast joinable,
    codegen'd, and shuffle-free when the band dim broadcasts.
    Non-aligned bands generalize via interval bucketing (assign each
    band to every grid cell it overlaps, then equi-join + residual
    range filter) — same principle, one extra explode on the dim side.

    `bands` must carry `band_lo_col` aligned to the grid (lo = k·width).
    """
    keyed_points = points.withColumn(
        "__band_id", F.floor(F.col(point_col) / F.lit(band_width)).cast("long")
    )
    keyed_bands = bands.withColumn(
        "__band_id", F.floor(F.col(band_lo_col) / F.lit(band_width)).cast("long")
    )
    return keyed_points.join(F.broadcast(keyed_bands), "__band_id").drop("__band_id")


def interval_bucket_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """General range join (point-in-interval, `lo <= v < hi`) for
    ARBITRARY intervals — unaligned, unequal widths, overlapping —
    rewritten as an equi-join on a grid cell plus a residual filter.

    This is the generalization `band_join` only sketches: each
    interval is replicated to every fixed-width grid cell it overlaps
    (`explode(sequence(floor(lo/w), floor(hi/w)))`), each point hashes
    to exactly one cell, and the range predicate becomes
    `cell == cell AND lo <= v < hi`. Catalyst executes the equality as
    a broadcast/shuffled hash join (codegen'd), and the residual range
    check runs as a post-join filter — O(|points| + |intervals|·cells)
    instead of the nested-loop O(|points|·|intervals|) Spark would
    otherwise pick for a pure-inequality condition.

    At 100 TB: points never replicate (one cell each); the interval
    side's blow-up factor is `avg_width / bucket_width`, tunable.
    Interval dims (price bands, campaign windows, IP ranges) are
    small → broadcast, so the fact side also never shuffles. Matches
    overlapping intervals by design (a point joins every interval
    containing it), which a partition-based bucketing cannot express.
    """
    def cell(c):
        return F.floor(c / F.lit(float(bucket_width))).cast("long")

    keyed_iv = intervals.withColumn(
        "__cell", F.explode(F.sequence(cell(F.col(lo_col)), cell(F.col(hi_col))))
    )
    iv_side = F.broadcast(keyed_iv) if broadcast_intervals else keyed_iv
    keyed_p = points.withColumn("__cell", cell(F.col(point_col)))
    return (
        keyed_p.join(iv_side, "__cell")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__cell")
    )
