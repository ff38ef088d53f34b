"""Statistical screens without a global sort: Spearman correlation,
the Mann-Whitney U test, binned Kendall tau-b, Welch's t, and exact
weighted percentiles — built on the distinct-value-grain ranking idiom
proven by gini_concentration (operators/fin.py).

North-star analytics surface with no reference analog (the reference's
single analytic output is one monthly GROUP BY aggregate,
/root/reference/src/sql/create_gold_layer.sql) — these are the
standard association / two-sample / quantile screens a spend warehouse
runs: "is account balance associated with realized spend"
(Spearman/Kendall), "do two segments draw from the same price
distribution" (Mann-Whitney/Welch), "what price does the median UNIT
sell at" (weighted percentiles).

Scale posture (the exact_ntile / gini lesson): ranks NEVER come from a
global-order window. Average ranks depend only on each distinct
value's global count-below Rᵥ and tie count cᵥ — so the plan is one
groupBy(value), an in-plan mantissa-refined exponent-bucket offset
fold (tiny bucket table, broadcast back — r10: no driver collect,
no global window),
one PARTITIONED in-bucket cumulative window over the DISTINCT table,
and one exact-integer aggregate. Doubled average ranks (2Rᵥ + cᵥ + 1) keep
everything integer through ties; moment sums ride DECIMAL(38,0).
The sums alone are exact to n ≲ 10¹², but Spearman's final products
n·sxx and sx·sx (sx ~ 2n²) exceed 38 digits near n ≈ 3·10⁹ — beyond
that the ppm lands NULL in non-ANSI Spark (error under ANSI), never
silently wrong; mann_whitney_u's u2_a long cast has a similar ~4·10⁹
ceiling. Restructure to divide-before-multiply if a deployment ever
needs the full 10¹². Spearman's single final expression is
fixed-order IEEE from exact integers (the HITS normalization idiom)
so both engines produce the identical double before the FLOOR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.ext.lineage import truncate_lineage


#: sub-bucket bits per binary exponent (r10): 2^6 order-preserving
#: slices inside every exponent bucket. Quantized domains (prices in
#: cents) concentrate ~all distinct values in a handful of exponents,
#: which made the per-bucket cumulative window a near-global
#: single-task sort (guide §2.5 skew); the mantissa slices restore
#: ~64× window parallelism per populated exponent while the offset
#: table stays tiny (≤ ~2·64·64 rows).
_SUBBUCKET_BITS = 6


def _order_bucket(x_col: str) -> F.Column:
    """Monotone (order-preserving, sign-aware) range bucket of a LONG
    column with NO prior min/max pass: binary exponent of |x| refined
    by the top ``_SUBBUCKET_BITS`` mantissa bits.

    mag = (⌊log₂|x|⌋ + 1) · 2^(j+1) + (|x| >> max(⌊log₂|x|⌋ − j, 0))
    is strictly increasing in |x| across and within exponents (the
    shifted value lives in [2^min(e,j), 2^(min(e,j)+1)) < 2^(j+1);
    long→double and log2 are monotone, and a boundary rounding of the
    exponent only merges a value into the NEIGHBORING slice, which
    keeps monotonicity — offsets come from actual counts, not from
    the bucket ids)."""
    j = _SUBBUCKET_BITS
    e = f"CAST(FLOOR(LOG2(ABS(CAST({x_col} AS DOUBLE)))) AS INT)"
    mag = (
        f"(CAST({e} AS BIGINT) + 1) * {1 << (j + 1)}"
        f" + SHIFTRIGHT(ABS({x_col}), GREATEST({e} - {j}, 0))"
    )
    return (
        F.when(F.col(x_col) == 0, F.lit(0))
        .when(F.col(x_col) > 0, F.expr(mag))
        .otherwise(-F.expr(mag))
        .cast("long")
    )


def attach_count_below(
    pc: DataFrame,
    x_col: str = "__x",
    c_col: str = "__c",
    wide: bool = True,
) -> DataFrame:
    """Given a DISTINCT-value-grain frame (``x_col`` unique, ``c_col``
    = multiplicity), return the frame plus ``__r`` = number of
    elements with value strictly below ``x_col`` — the shared
    primitive behind gini / Spearman / Mann-Whitney.

    NO global-order window and (r10) NO driver round-trip: values are
    range-bucketed by ``_order_bucket`` (sign-aware ⌊log₂⌋ refined by
    mantissa slices — order-preserving, no prior min/max pass), the
    per-bucket totals → prefix offsets run as an in-plan fold over
    the tiny bucket table (collect_list + aggregate HOF, ≤ ~8 k rows
    by construction) that is then BROADCAST back, and the cumulative
    window is PARTITIONED by bucket. The whole attach is ONE lazy plan — no persist, no
    collect, no checkpoint; the caller's single action executes it
    (the bucket-total branch reuses the groupBy exchange that
    produced ``pc`` where one exists)."""
    # wide=True: hash-cluster the distinct table by bucket at the
    # cluster's parallelism. The per-bucket cumulative window needs an
    # exchange on __rs_b REGARDLESS (its input arrives partitioned by
    # value at best), so this explicit repartition replaces the
    # planner's ENSURE_REQUIREMENTS exchange 1:1 — and, unlike it, is
    # exempt from AQE coalescing, which otherwise collapses the ~10 MB
    # post-shuffle stage to ONE task and runs the window serially
    # (guide §2.5). The bucket-totals branch inherits the clustering.
    # wide=False (callers whose distinct table is entity-bounded and
    # who attach several rank maps in one plan — spearman): leave the
    # exchange to the planner so AQE right-sizes the tiny stages;
    # forcing cluster-width tasks there multiplies scheduler overhead
    # across the duplicated pruned subtrees (r10: measured 2× worse).
    pb = pc.withColumn("__rs_b", _order_bucket(x_col))
    if wide:
        pb = pb.repartition(
            pc.sparkSession.sparkContext.defaultParallelism, "__rs_b"
        )
    btot = pb.groupBy("__rs_b").agg(F.sum(c_col).alias("__rs_t"))
    # prefix offsets WITHOUT a window node (the engine's no-global-
    # window contract, tests/test_quality_and_plans.py): collect the
    # bounded bucket table (≤ ~2·64·64 rows by construction — O(1) in
    # data size) into ONE sorted array and left-fold exact prefix
    # sums in-plan, then explode back to (bucket, offset) rows. Same
    # single-branch shape as a window (btot has exactly one
    # consumer, so nothing is recomputed across broadcast
    # boundaries), still zero driver round-trips.
    offs = (
        btot.agg(
            F.array_sort(
                F.collect_list(F.struct("__rs_b", "__rs_t"))
            ).alias("__rs_a")
        )
        .select(
            F.explode(
                F.expr(
                    "aggregate(__rs_a,"
                    " struct(CAST(0 AS BIGINT) AS acc,"
                    "        CAST(array() AS"
                    "          array<struct<b:BIGINT,off:BIGINT>>)"
                    "          AS out),"
                    " (s, x) -> struct(s.acc + x.__rs_t AS acc,"
                    "   array_append(s.out,"
                    "     struct(x.__rs_b AS b, s.acc AS off)) AS out),"
                    " s -> s.out)"
                )
            ).alias("__rs_e")
        )
        .select(
            F.col("__rs_e.b").alias("__rs_b"),
            F.col("__rs_e.off").cast("long").alias("__rs_off"),
        )
    )
    w = (
        Window.partitionBy("__rs_b")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pb.join(F.broadcast(offs), on="__rs_b")
        .withColumn(
            "__r",
            F.col("__rs_off")
            + F.coalesce(F.sum(c_col).over(w), F.lit(0)),
        )
        .drop("__rs_b", "__rs_off")
    )


def _dec(c: "F.Column") -> "F.Column":
    return c.cast("decimal(38,0)")


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact-tie Spearman rank correlation of two integer-valued
    columns. One row out: (n_keys, spearman_ppm) with spearman_ppm =
    ⌊ρ·10⁶⌋, ρ = Pearson on average ranks (ties get their run's mean
    rank — the textbook tie treatment).

    Doubled average ranks 2Rᵥ+cᵥ+1 are integers, so every moment sum
    is exact DECIMAL(38,0); ρ's numerator/denominator terms are exact
    integers and the ONE IEEE expression num/√(dx·dy)·10⁶ is evaluated
    in the same fixed order by both engines before the FLOOR
    (bit-stable — the HITS idiom). Zero-variance marginals (all x or
    all y tied) → NULL. Plan: 2 value-grain rank maps + 2 equi-joins
    back to the fact + 1 wide aggregate — no global sort anywhere.
    """
    base = df.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    dx = base.groupBy("__x").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    dy = base.groupBy("__y").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    # wide=False: the two rank maps are entity-bounded and this ONE
    # lazy plan carries several pruned copies of the base subtree —
    # AQE-sized tiny stages beat cluster-width fan-out here (r10)
    rx = attach_count_below(dx, x_col="__x", wide=False)
    ry = attach_count_below(dy, x_col="__y", wide=False)
    rx = rx.select(
        "__x",
        (F.lit(2) * F.col("__r") + F.col("__c") + 1).alias("__drx"),
    )
    ry = ry.select(
        "__y",
        (F.lit(2) * F.col("__r") + F.col("__c") + 1).alias("__dry"),
    )
    j = base.join(rx, on="__x").join(ry, on="__y")
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec(F.col("__drx"))).alias("sx"),
        F.sum(_dec(F.col("__dry"))).alias("sy"),
        F.sum(_dec(F.col("__drx")) * _dec(F.col("__drx"))).alias("sxx"),
        F.sum(_dec(F.col("__dry")) * _dec(F.col("__dry"))).alias("syy"),
        F.sum(_dec(F.col("__drx")) * _dec(F.col("__dry"))).alias("sxy"),
    )
    t = m.select(
        "n",
        F.expr("n * sxy - sx * sy").alias("__num"),
        F.expr("n * sxx - sx * sx").alias("__dx"),
        F.expr("n * syy - sy * sy").alias("__dy"),
    )
    return t.select(
        F.col("n").alias("n_keys"),
        F.when(
            (F.col("__dx") > 0) & (F.col("__dy") > 0),
            F.floor(
                F.col("__num").cast("double")
                / F.sqrt(
                    F.col("__dx").cast("double")
                    * F.col("__dy").cast("double")
                )
                * F.lit(1000000.0)
            ).cast("long"),
        ).alias("spearman_ppm"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between group A
    (``group_col == group_a``) and everything else, with exact tie
    handling via doubled average ranks. One row out:

      * n_a, n_b — group sizes,
      * u2_a — 2·U_A exactly (doubled so ties never leave the
        integers; U_A itself may be half-integer under ties),
      * rank_biserial_ppm — ⌊(2·U_A/(n_a·n_b) − 1)·10⁶⌋, the standard
        effect size, a RATIO OF INTEGERS floor'd via the pmod trick
        (Spark DIV truncates; the numerator can be negative).

    ALL-integer end to end — no IEEE anywhere. Plan: one
    groupBy(value) with a conditional group-A count, the shared
    count-below attach (bucket offsets, partitioned window), one
    aggregate. Value-grain only: the fact table is touched once.
    """
    base = df.select(
        F.col(value_col).cast("long").alias("__x"),
        (F.col(group_col) == F.lit(group_a)).alias("__ga"),
    ).filter(F.col("__x").isNotNull() & F.col("__ga").isNotNull())
    pc = base.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum(F.when(F.col("__ga"), 1).otherwise(0))
        .cast("long")
        .alias("__ca"),
    )
    r = attach_count_below(pc)
    dr = F.lit(2) * F.col("__r") + F.col("__c") + 1
    m = r.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum(F.col("__c") - F.col("__ca")).cast("long").alias("n_b"),
        F.sum(_dec(F.col("__ca")) * _dec(dr)).alias("__r1x2"),
    )
    u = m.select(
        "n_a",
        "n_b",
        F.expr(
            "`__r1x2` - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
        ).alias("__u2"),
    )
    return u.select(
        "n_a",
        "n_b",
        F.col("__u2").cast("long").alias("u2_a"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(
                "CAST(((`__u2` - CAST(n_a AS DECIMAL(38,0)) * n_b)"
                " * 1000000"
                " - pmod((`__u2` - CAST(n_a AS DECIMAL(38,0)) * n_b)"
                "        * 1000000,"
                "        CAST(n_a AS DECIMAL(38,0)) * n_b))"
                " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ),
        ).alias("rank_biserial_ppm"),
    )


def binned_cells(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """The shared decile-grid builder behind ``kendall_tau_binned``
    and ``theilsen_slope_binned``: ntile-bin BOTH margins in ONE fused
    ``exact_ntile_multi`` pass (the two stacked distinct-value tables
    share every driver round-trip) and collapse to (bx, by, n) cell
    counts — ≤ n_bins² rows regardless of input size.

    Returns a PERSISTED, materialized frame; the caller owns the
    unpersist. The input projection is persisted only for the
    duration of the build (the multi-ntile pass scans it for the
    stacked distinct build, the boundary-tie resolve, and the final
    assignment — without the cache each scan would recompute the
    caller's upstream join)."""
    from .windows import exact_ntile_multi

    base = (
        df.select(
            F.col(key_col).alias("__k"),
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
        )
        .filter(
            F.col("__x").isNotNull()
            & F.col("__y").isNotNull()
            & F.col("__k").isNotNull()
        )
        .persist()
    )
    try:
        b = exact_ntile_multi(
            base,
            [(n_bins, "__x", "__k", "bx"), (n_bins, "__y", "__k", "by")],
        )
        cells = (
            b.groupBy("bx", "by")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .persist()
        )
        cells.count()  # materialize before the base cache drops
        return cells
    finally:
        base.unpersist()


def kendall_tau_binned(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_col: str,
    n_bins: int = 10,
    cells: DataFrame | None = None,
) -> DataFrame:
    """Kendall tau-b over NTILE-BINNED variables — the bounded-grid
    contract that makes Kendall feasible at scale: exact tau needs
    concordant/discordant counts over all row pairs (O(n²) naive,
    O(n log n) only via a sequential merge sort), but binning both
    margins to ``n_bins`` deciles first bounds the pair accounting to
    an n_bins² cell grid regardless of row count. One row out:
    (n_rows, conc_pairs, disc_pairs, tau_b_ppm).

    Binning = the tie-stable ``exact_ntile`` (value, key ordering —
    rows with equal values may split across adjacent buckets exactly
    as SQL ntile does; the oracle twin bins identically, so the split
    is deterministic cross-engine). Cell pairs with ax<bx count once
    per unordered pair; same-bx pairs are x-ties by construction and
    enter tau-b's denominator corrections (n1/n2), not C/D.

    ALL-integer until the single final IEEE expression
    (C−D)·10⁶ / √((n0−n1)·(n0−n2)) — the spearman/HITS idiom. Plan:
    one fused two-margin ntile pass (broadcast cuts, no global
    window; ``binned_cells``), one ≤n_bins² cell agg, one broadcast
    cell self-join, one wide aggregate. Degenerate margins
    (everything one bucket) → NULL.

    ``cells=`` fast path: a caller that also needs the Theil-Sen
    slope of the SAME (x, y) pair passes the ``binned_cells`` grid
    once and both statistics derive from it without re-binning (the
    caller then owns the persist lifetime)."""
    own = cells is None
    if own:
        cells = binned_cells(df, x_col, y_col, key_col, n_bins)
    try:
        dec = "decimal(38,0)"
        a = cells.select(
            F.col("bx").alias("ax"),
            F.col("by").alias("ay"),
            F.col("n").cast(dec).alias("an"),
        )
        c = F.broadcast(
            cells.select(
                F.col("bx").alias("cx"),
                F.col("by").alias("cy"),
                F.col("n").cast(dec).alias("cn"),
            )
        )
        cd = a.crossJoin(c).agg(
            F.sum(
                F.when(
                    (F.col("ax") < F.col("cx"))
                    & (F.col("ay") < F.col("cy")),
                    F.col("an") * F.col("cn"),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("conc"),
            F.sum(
                F.when(
                    (F.col("ax") < F.col("cx"))
                    & (F.col("ay") > F.col("cy")),
                    F.col("an") * F.col("cn"),
                ).otherwise(F.lit(0).cast(dec))
            ).alias("disc"),
        )
        margx = (
            cells.groupBy("bx")
            .agg(F.sum("n").cast(dec).alias("t"))
            .agg(
                F.sum(
                    F.col("t") * (F.col("t") - 1) / F.lit(2)
                ).cast(dec).alias("n1"),
                F.sum("t").cast(dec).alias("ntot"),
            )
        )
        margy = (
            cells.groupBy("by")
            .agg(F.sum("n").cast(dec).alias("t"))
            .agg(
                F.sum(
                    F.col("t") * (F.col("t") - 1) / F.lit(2)
                ).cast(dec).alias("n2")
            )
        )
        m = cd.crossJoin(F.broadcast(margx)).crossJoin(F.broadcast(margy))
        out = m.select(
            F.coalesce(F.col("ntot"), F.lit(0)).cast("long").alias(
                "n_rows"
            ),
            F.coalesce(F.col("conc"), F.lit(0)).cast("long").alias(
                "conc_pairs"
            ),
            F.coalesce(F.col("disc"), F.lit(0)).cast("long").alias(
                "disc_pairs"
            ),
            # ntot·(ntot−1) is even, so /2 is exact in decimal — DIV
            # would narrow to BIGINT and overflow first at lake scale
            (
                F.col("ntot") * (F.col("ntot") - F.lit(1)) / F.lit(2)
            ).cast("decimal(38,0)").alias("__n0"),
            F.col("n1").alias("__n1"),
            F.col("n2").alias("__n2"),
            (F.col("conc") - F.col("disc")).alias("__num"),
        )
        res = out.select(
            "n_rows",
            "conc_pairs",
            "disc_pairs",
            F.when(
                (F.col("__n0") - F.col("__n1") > 0)
                & (F.col("__n0") - F.col("__n2") > 0),
                F.floor(
                    F.col("__num").cast("double")
                    / F.sqrt(
                        (F.col("__n0") - F.col("__n1")).cast("double")
                        * (F.col("__n0") - F.col("__n2")).cast("double")
                    )
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias("tau_b_ppm"),
        )
        if own:
            # materialize the 1-row result WHILE the grid cache is
            # live — otherwise the finally's unpersist makes the
            # caller's action re-execute the whole grid build
            res = truncate_lineage(res)
        return res
    finally:
        if own:
            cells.unpersist()


def welch_t_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
) -> DataFrame:
    """Welch's unequal-variance t statistic between group A
    (``group_col == group_a``) and everything else — the parametric
    companion to ``mann_whitney_u``. One row out: (n_a, n_b,
    mean_a_cents, mean_b_cents, t_ppm).

    Moments are exact DECIMAL(38,0) sums from ONE conditional-agg
    scan; means land as floor'd integers (exact DIV); the t statistic
    is a FIXED-ORDER IEEE expression over the exact integers —
    m = s/n, v = (ss − s·s/n)/(n−1), t = (m_a − m_b)/√(v_a/n_a +
    v_b/n_b) — with every cast/divide in the same sequence as the
    DuckDB twin, so even the cancellation-amplified cases produce the
    identical double before the floor (the HITS idiom). Degenerate
    inputs (either group with < 2 rows, or both variances zero) →
    NULL t_ppm. No shuffle beyond one partial-agg'd global aggregate."""
    base = df.select(
        F.col(value_col).cast("long").alias("__x"),
        (F.col(group_col) == F.lit(group_a)).alias("__ga"),
    ).filter(F.col("__x").isNotNull() & F.col("__ga").isNotNull())
    dx = _dec(F.col("__x"))
    m = base.agg(
        F.sum(F.when(F.col("__ga"), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(~F.col("__ga"), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("__ga"), dx).otherwise(F.lit(0).cast(
            "decimal(38,0)"))).alias("sa"),
        F.sum(F.when(~F.col("__ga"), dx).otherwise(F.lit(0).cast(
            "decimal(38,0)"))).alias("sb"),
        F.sum(F.when(F.col("__ga"), dx * dx).otherwise(F.lit(0).cast(
            "decimal(38,0)"))).alias("saa"),
        F.sum(F.when(~F.col("__ga"), dx * dx).otherwise(F.lit(0).cast(
            "decimal(38,0)"))).alias("sbb"),
    )
    va = (
        "(CAST(saa AS DOUBLE)"
        " - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))"
        " / CAST(n_a - 1 AS DOUBLE)"
    )
    vb = (
        "(CAST(sbb AS DOUBLE)"
        " - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / CAST(n_b - 1 AS DOUBLE)"
    )
    se2 = f"({va} / CAST(n_a AS DOUBLE) + {vb} / CAST(n_b AS DOUBLE))"
    md = (
        "(CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))"
    )
    return m.select(
        "n_a",
        "n_b",
        F.when(
            F.col("n_a") > 0, F.expr("CAST(sa DIV n_a AS BIGINT)")
        ).alias("mean_a_cents"),
        F.when(
            F.col("n_b") > 0, F.expr("CAST(sb DIV n_b AS BIGINT)")
        ).alias("mean_b_cents"),
        F.when(
            (F.col("n_a") > 1)
            & (F.col("n_b") > 1)
            & (F.expr(se2) > 0),
            F.expr(
                f"CAST(FLOOR({md} / SQRT({se2}) * 1000000.0) AS BIGINT)"
            ),
        ).alias("t_ppm"),
    )


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    quantiles_pct: tuple[int, ...] = (50, 90),
) -> DataFrame:
    """Exact weighted percentiles (lower weighted quantile: the
    smallest value whose cumulative weight reaches q·W) WITHOUT a
    global sort — the count-below primitive with weights as the
    multiplicity column. "What price does the median UNIT sell at"
    (quantity-weighted) differs from the median ORDER price whenever
    big orders skew cheap — the weighted quantile is the inventory /
    exposure view.

    One row out: (total_weight, n_values, p{q}_weighted...). ALL
    integer: the defining inequality cum·100 ≥ q·W is exact, and the
    answer per quantile is a MIN over qualifying distinct values —
    no order-dependent arithmetic at all. Plan (r10: ONE lazy plan,
    no driver round-trip): one value-grain agg, the shared
    bucket-offset attach (partitioned window), the total weight W as
    a 1-row broadcast cross join (its Σ branch reuses the value-grain
    exchange), one filter + min aggregate per quantile over the
    distinct table. Nonpositive weights are excluded (a zero/negative
    weight is an upstream bug, not a sample). Empty input → 0s and
    NULLs."""
    base = df.select(
        F.col(value_col).cast("long").alias("__x"),
        F.col(weight_col).cast("long").alias("__w"),
    ).filter(
        F.col("__x").isNotNull() & (F.col("__w") > 0)
    )
    pc = base.groupBy("__x").agg(F.sum("__w").cast("long").alias("__c"))
    r = attach_count_below(pc)
    tot = pc.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__tw")
    )
    cum = F.col("__r") + F.col("__c")  # cumulative weight through __x
    aggs = [
        # the cross join leaves zero rows on empty input: coalesce the
        # total back to the documented 0
        F.coalesce(F.max("__tw"), F.lit(0))
        .cast("long")
        .alias("total_weight"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    ]
    for q in quantiles_pct:
        # both sides as LONG: q·W on int32 literals overflows as soon
        # as total weight crosses 2³¹/q (~24M units at q=90)
        aggs.append(
            F.min(
                F.when(
                    cum * F.lit(100).cast("long")
                    >= F.lit(q).cast("long") * F.col("__tw"),
                    F.col("__x"),
                )
            ).alias(f"p{q}_weighted")
        )
    return r.crossJoin(F.broadcast(tot)).agg(*aggs)


def theilsen_slope_binned(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_col: str,
    n_bins: int = 10,
    cells: DataFrame | None = None,
) -> DataFrame:
    """Theil-Sen robust trend (median of pairwise slopes) under the
    same BINNED-GRID contract as ``kendall_tau_binned``: exact
    Theil-Sen needs the median over O(n²) pairwise slopes; ntile-bin
    both margins first and the slope population collapses to weighted
    cell pairs on an n_bins² grid.

    The decisive trick: on a decile grid both deltas are in 1..9 (x,
    strictly positive across distinct bins) × −9..9 (y), so EVERY
    pairwise slope Δy/Δx is exactly representable as the integer
    Δy·2520/Δx (2520 = lcm(1..9) — the division leaves no remainder).
    The weighted median over those integer keys then rides the shared
    count-below primitive: no floats, no global sort, and the one
    output division floors via the pmod trick (slopes can be
    negative). Output row: (n_rows, pair_weight, slope_ppm) with
    slope_ppm = ⌊median(Δy/Δx)·10⁶⌋ in y-bins-per-x-bin units.

    Weighted-median weights are n_a·n_c sums in int64 — exact for
    n ≲ 4·10⁹ rows (the count-below contract; DECIMAL the two agg
    columns beyond that). Degenerate inputs (no cross-bin pair, e.g.
    all rows in one x bucket) → NULL slope.

    Binning rides the shared ``binned_cells`` grid (one fused
    two-margin ntile pass); ``cells=`` lets a caller that also runs
    ``kendall_tau_binned`` on the SAME pair bin exactly once."""
    own = cells is None
    if own:
        cells = binned_cells(df, x_col, y_col, key_col, n_bins)
    try:
        # 1-row broadcast, not a collect: the whole statistic below is
        # ONE lazy plan — zero driver round-trips after the grid build
        n1 = F.broadcast(
            cells.agg(
                F.coalesce(F.sum("n").cast("long"), F.lit(0).cast("long"))
                .alias("__nr")
            )
        )
        a = cells.select(
            F.col("bx").alias("ax"),
            F.col("by").alias("ay"),
            F.col("n").alias("an"),
        )
        c = F.broadcast(
            cells.select(
                F.col("bx").alias("cx"),
                F.col("by").alias("cy"),
                F.col("n").alias("cn"),
            )
        )
        # slope key = Δy·2520/Δx, exact because Δx ∈ 1..(n_bins−1)
        # divides 2520 for n_bins ≤ 10
        if n_bins > 10:
            raise ValueError("binned Theil-Sen supports n_bins <= 10")
        pairs = (
            a.crossJoin(c)
            .filter(F.col("ax") < F.col("cx"))
            .select(
                # CASE-guarded: Catalyst may evaluate the projection
                # alongside the filter inside one codegen stage, and
                # ANSI mode turns the Δx=0 pairs the filter discards
                # into DIVIDE_BY_ZERO unless the branch guards them
                F.when(
                    F.col("cx") > F.col("ax"),
                    (F.col("cy") - F.col("ay"))
                    * F.lit(2520)
                    / (F.col("cx") - F.col("ax")),
                )
                .cast("long")
                .alias("__x"),
                (F.col("an") * F.col("cn")).alias("__w"),
            )
        )
        pc = pairs.groupBy("__x").agg(
            F.sum("__w").cast("long").alias("__c")
        )
        # count-below on the BOUNDED slope population (≤ n_bins²·
        # (n_bins−1)/2 distinct keys by the grid contract): a
        # broadcast self-join replaces the generic exponent-bucket
        # primitive — no driver collects, the whole median is lazy
        pcb = F.broadcast(
            pc.select(
                F.col("__x").alias("__x2"), F.col("__c").alias("__c2")
            )
        )
        r = (
            pc.crossJoin(pcb)
            .groupBy("__x", "__c")
            .agg(
                F.sum(
                    F.when(F.col("__x2") < F.col("__x"), F.col("__c2"))
                    .otherwise(F.lit(0).cast("long"))
                ).alias("__r"),
                F.sum("__c2").alias("__t"),
            )
        )
        med = r.agg(
            F.min(
                F.when(
                    (F.col("__r") + F.col("__c")) * 2 >= F.col("__t"),
                    F.col("__x"),
                )
            ).alias("__key"),
            F.max("__t").alias("__t"),
        )
        res = med.crossJoin(n1).select(
            F.col("__nr").alias("n_rows"),
            F.coalesce(F.col("__t"), F.lit(0)).cast("long").alias(
                "pair_weight"
            ),
            F.expr(
                "CAST((`__key` * 1000000"
                " - pmod(`__key` * 1000000, 2520)) DIV 2520 AS BIGINT)"
            ).alias("slope_ppm"),
        )
        if own:
            # materialize the 1-row result WHILE the grid cache is
            # live (the kendall_tau_binned note)
            res = truncate_lineage(res)
        return res
    finally:
        if own:
            cells.unpersist()


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group exact-tie Spearman — ``spearman_corr`` computed
    independently within every value of ``group_col`` ("is balance
    associated with spend IN EACH SEGMENT" — Simpson's-paradox
    screening, the reason the global number alone misleads).

    Same doubled-average-rank construction, but ranks come from
    windows PARTITIONED BY (group) over the per-group DISTINCT-value
    table: the window input is bounded by distinct values per group,
    never rows, and parallelism is the group count × value spread —
    the cusum/per-series shape, fine for any bounded-cardinality
    grouping column (segments, regions, priority classes; for an
    unbounded key you'd re-bucket as in attach_count_below). One
    row per group: (group, n_keys, spearman_ppm), NULL rho for
    zero-variance marginals, groups ordered by name."""
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
    )

    def ranks(col: str, out: str) -> DataFrame:
        pc = base.groupBy("__g", col).agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
        w = (
            Window.partitionBy("__g")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return pc.select(
            "__g",
            col,
            (
                F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                + F.col("__c")
                + 1
            ).alias(out),
        )

    rx = ranks("__x", "__drx")
    ry = ranks("__y", "__dry")
    j = base.join(rx, on=["__g", "__x"]).join(ry, on=["__g", "__y"])
    m = j.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec(F.col("__drx"))).alias("sx"),
        F.sum(_dec(F.col("__dry"))).alias("sy"),
        F.sum(_dec(F.col("__drx")) * _dec(F.col("__drx"))).alias("sxx"),
        F.sum(_dec(F.col("__dry")) * _dec(F.col("__dry"))).alias("syy"),
        F.sum(_dec(F.col("__drx")) * _dec(F.col("__dry"))).alias("sxy"),
    )
    t = m.select(
        "__g",
        "n",
        F.expr("n * sxy - sx * sy").alias("__num"),
        F.expr("n * sxx - sx * sx").alias("__dx"),
        F.expr("n * syy - sy * sy").alias("__dy"),
    )
    return t.select(
        F.col("__g").alias(group_col),
        F.col("n").alias("n_keys"),
        F.when(
            (F.col("__dx") > 0) & (F.col("__dy") > 0),
            F.floor(
                F.col("__num").cast("double")
                / F.sqrt(
                    F.col("__dx").cast("double")
                    * F.col("__dy").cast("double")
                )
                * F.lit(1000000.0)
            ).cast("long"),
        ).alias("spearman_ppm"),
    ).orderBy(group_col)
