"""Aggregation operators.

Covers SURVEY.md §2 rows B1 (monthly group-by agg — the reference's
dormant gold layer, create_gold_layer.sql:1-6), C7 (approximate
aggregates), C10 (rollup/cube), A25 (count).

Scale notes: all of these are hash aggregates with map-side partial
aggregation — Catalyst plans partial_sum/partial_count before the
shuffle, so the shuffle moves one row per (group × partition), not
per input row. Group-by keys here (year/month, returnflag, segment)
are low-cardinality, so the final agg is a handful of rows regardless
of input size; skew is impossible to avoid with 12 groups but
irrelevant because partial aggregation has already collapsed the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum


def monthly_spend(orders: DataFrame, date_col: str = "o_orderdate", amount_col: str = "o_totalprice") -> DataFrame:
    """B1 — the reference's dormant gold query, generalized.

    Reference intent: gold_monthly_spending(month, year, total_spend,
    avg_spend) declared at create_gold_layer.sql:1-6 but never
    populated; we implement the missing transform as a declarative
    groupBy-agg and let Catalyst plan the partial/final hash agg.
    """
    return (
        orders.groupBy(
            F.year(date_col).alias("year"),
            F.month(date_col).alias("month"),
        )
        .agg(
            dsum(amount_col).alias("total_spend"),
            davg(amount_col).alias("avg_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("year", "month")
    )


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter + multi-agg group-by.

    Exercises A9 (range predicate, pushed to the parquet scan) + B1
    (hash agg) in one plan; disc_price/charge are computed per-row in
    codegen before the partial agg.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            # scale 4: price(2dp)·(1-disc)(2dp) has ≤4 true decimals, so a
            # 4dp decimal cast is exact — no half-cent rounding ties that
            # HALF_UP (Spark) and HALF_EVEN (DuckDB) would break on.
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(18,4)").alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount", "decimal(18,4)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def rollup_spend(orders: DataFrame) -> DataFrame:
    """C10 — grouping-sets rollup: (year, month) totals with subtotals
    and a grand total, one shuffle (Catalyst expands the grouping sets
    map-side)."""
    return (
        orders.rollup(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("year").asc_nulls_first(), F.col("month").asc_nulls_first())
    )


def cube_spend(orders: DataFrame) -> DataFrame:
    """C10 — cube over (orderstatus, orderpriority)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def exact_distinct_counts(orders: DataFrame) -> DataFrame:
    """C7 twin (exact): distinct customers/statuses — oracle-checkable."""
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def approx_aggregates(orders: DataFrame) -> DataFrame:
    """C7 — approximate aggregates for 100 TB cardinality estimation.

    approx_count_distinct = HyperLogLog++ (fixed-size sketch, no
    shuffle explosion vs exact distinct's per-key shuffle);
    percentile_approx = a mergeable quantile sketch. Algorithm-specific
    outputs differ from DuckDB's sketches, so this entry is rows-only
    checked (SURVEY.md §2.C7).
    """
    return orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median_price"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("approx_p99_price"),
    )


def row_count(df: DataFrame) -> DataFrame:
    """A25 — count as a 1-row DataFrame (reference len() at extract.py:22)."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def algebraic_moments(lineitem: DataFrame) -> DataFrame:
    """Distributed second-moment statistics (stddev, correlation) built
    from exact decimal power sums.

    ``stddev``/``corr`` built-ins accumulate doubles in partition order,
    so their low bits differ between engines (and between runs at
    different parallelism). Instead we shuffle only the five exact
    power sums — sum(x), sum(y), sum(x²), sum(y²), sum(x·y) — as
    DECIMALs (associative, order-independent), then assemble the
    statistic in double on the handful of final rows and round.
    This is the textbook map-side-combinable form: at 100 TB the
    shuffle still carries one 5-number row per (group × partition).
    """
    # Widths sized to the value domain (qty ≤ 50, price ≤ ~1e5) so that
    # the product width w1+w2 stays ≤ 38 in both engines — DuckDB's
    # decimal multiply errors when the declared result can't hold it.
    # r10 (guide §2.5): the decimal power sums are the expensive part
    # (the Σy² accumulator exceeds Decimal's compact-long range, so
    # every row pays a BigDecimal add) and a single-row-group scan
    # runs them on one core. Fan out on a DETERMINISTIC content-hash
    # key (guide §2.5: pmod(xxhash64(...), k·n) — keyed exchanges
    # skip the round-robin path's serial pre-shuffle sort, and the
    # hash key is retry-stable unlike rand()); the partial
    # aggregation stays map-side combinable and the decimal sums
    # re-associate exactly. A cluster-scale scan arrives wide and
    # skips the exchange.
    lineitem = lineitem.select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    sc = lineitem.sparkSession.sparkContext
    if not lineitem.isStreaming and (
        lineitem.rdd.getNumPartitions() < sc.defaultParallelism
    ):
        lineitem = lineitem.repartition(
            sc.defaultParallelism,
            F.pmod(
                F.xxhash64("l_returnflag", "l_quantity", "l_extendedprice"),
                F.lit(64 * sc.defaultParallelism),
            ),
        )
    x = F.col("l_quantity").cast("decimal(9,4)")
    y = F.col("l_extendedprice").cast("decimal(14,4)")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - F.lit(1.0))
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - F.lit(1.0))
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - F.lit(1.0))
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(F.sqrt(var_x), 4).alias("stddev_qty"),
        F.round(cov / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
    )


def oracle_algebraic_moments() -> str:
    """DuckDB twin of :func:`algebraic_moments` — same decimal power
    sums, same double-side assembly, same rounding."""
    return """
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n AS n_rows,
           round(sqrt((sxx - sx*sx/n) / (n - 1.0)), 4) AS stddev_qty,
           round(((sxy - sx*sy/n) / (n - 1.0))
                 / sqrt(((sxx - sx*sx/n) / (n - 1.0))
                      * ((syy - sy*sy/n) / (n - 1.0))), 6) AS corr_qty_price
    FROM s
    """


def deterministic_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Most frequent ``value_col`` per ``group_col`` with a total-order
    tiebreak (count DESC, value ASC) — deterministic where the MODE()
    built-ins of both engines leave ties unspecified.

    Two hash aggregations on the same key prefix: Catalyst plans the
    second groupBy's shuffle over data already collapsed to
    |group × value| rows, then a row_number window over the tiny
    grouped result.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col(value_col).asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(group_col, F.col(value_col).alias("mode_value"), F.col("n").alias("n_occurrences"))
    )


def zscore_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_cols: list[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score anomaly detection: rows with
    |value − mean| / stddev_pop ≥ threshold.

    Two-pass shape that stays one-shuffle-each at any scale: (1) a hash
    aggregate reduces each group to exact decimal power sums (n, Σx,
    Σx²) — map-side combinable, order-independent (see
    `algebraic_moments`); (2) the per-group stats (tiny: one row per
    group) broadcast-join back onto the fact, so the scoring pass never
    shuffles the fact table. The z expression is assembled in one fixed
    double operation order and rounded to 6 digits, making the scores —
    and therefore the threshold filter — engine-reproducible.
    """
    x = F.col(value_col).cast("decimal(18,6)")
    stats = df.groupBy(*keys).agg(
        F.count(value_col).alias("__n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(x * x).cast("double").alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__sx") / n
    var_pop = (F.col("__sxx") - F.col("__sx") * F.col("__sx") / n) / n
    z = F.round((F.col(value_col) - mean) / F.sqrt(var_pop), 6)
    return (
        df.join(F.broadcast(stats), keys)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= F.lit(threshold))
        .select(*id_cols, *keys, value_col, "z")
    )


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Robust per-group anomaly profile via Median Absolute Deviation:
    n, median, MAD, and the count of rows with |x − med| > 3·MAD.

    The robust twin of `zscore_outliers` (median/MAD ignore the heavy
    tail that inflates mean/stddev). Same two-broadcast shape: each
    percentile pass reduces to one row per group that broadcasts back,
    so the fact table never shuffles. med/MAD are rounded to 4 digits
    first — the engines' interpolation is algebraically equivalent but
    FP-different (cf. exact_percentiles), and the rounded cuts make the
    threshold compare engine-identical.
    """
    c = F.col(value_col)
    med = df.groupBy(*keys).agg(
        F.round(F.percentile(c, F.lit(0.5)), 4).alias("med_r")
    )
    j = df.join(F.broadcast(med), keys)
    mad = j.groupBy(*keys).agg(
        F.round(F.percentile(F.abs(c - F.col("med_r")), F.lit(0.5)), 4).alias(
            "mad_r"
        )
    )
    return (
        j.join(F.broadcast(mad), keys)
        .groupBy(*keys, "med_r", "mad_r")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.abs(c - F.col("med_r")) > 3 * F.col("mad_r")).alias(
                "n_outliers"
            ),
        )
    )


def mad_outliers_approx(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    accuracy: int = 10_000,
) -> DataFrame:
    """mad_outliers with sketch-backed medians — the 100 TB form.

    Identical plan shape (two one-row-per-group aggregates broadcast
    back, fact never shuffles); the only change is
    `approx_percentile`, whose Greenwald-Khanna state is O(accuracy)
    per group instead of the exact percentile's value→count map
    (unbounded on mostly-distinct doubles). Guaranteed rank error ≤
    n/accuracy, so med/MAD land within one neighboring value — the
    outlier-count contract degrades gracefully and a tolerance test
    (tests/test_aggregates_approx.py) pins it against the exact twin.
    Deterministic for a fixed dataset+accuracy (GK is deterministic),
    but NOT oracle-comparable: DuckDB has no GK twin — registry entry
    is rows-only by design.
    """
    c = F.col(value_col)
    med = df.groupBy(*keys).agg(
        F.round(F.approx_percentile(c, F.lit(0.5), F.lit(accuracy)), 4).alias(
            "med_r"
        )
    )
    j = df.join(F.broadcast(med), keys)
    mad = j.groupBy(*keys).agg(
        F.round(
            F.approx_percentile(
                F.abs(c - F.col("med_r")), F.lit(0.5), F.lit(accuracy)
            ),
            4,
        ).alias("mad_r")
    )
    return (
        j.join(F.broadcast(mad), keys)
        .groupBy(*keys, "med_r", "mad_r")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.abs(c - F.col("med_r")) > 3 * F.col("mad_r")).alias(
                "n_outliers"
            ),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Equi-depth histogram WITHOUT a global sort: exact interpolated
    quantile cutpoints (one aggregate), broadcast back as a single
    array row, bucket = count of cutpoints below the value (a map-side
    higher-order fold). The ntile() formulation needs a total order —
    one task at any scale; this shape is two tiny aggregates around a
    map-side pass. Cutpoints are rounded to 4 digits to pin the
    bucket-boundary compare across engines.

    Scale note: Spark's EXACT percentile keeps a value→count map per
    partial aggregate (2.4 s over 600k mostly-distinct doubles at
    sf0.1, and unbounded memory at 100 TB). This operator is exact to
    stay oracle-comparable; at scale swap the cutpoint aggregate for
    `approx_percentile` — every other part of the plan is unchanged.
    """
    c = F.col(value_col)
    pcts = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    cuts = df.agg(
        F.transform(F.percentile(c, pcts), lambda q: F.round(q, 4)).alias(
            "cuts"
        )
    )
    bucketed = df.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cuts"), lambda q: q < c))
        .cast("bigint")
        .alias("bucket"),
        c,
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(c).alias("lo"),
            F.max(c).alias("hi"),
        )
        .orderBy("bucket")
    )


def equi_depth_histogram_approx(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 20,
    accuracy: int = 10_000,
) -> DataFrame:
    """equi_depth_histogram with sketch cutpoints — the swap the exact
    version's docstring promises at scale.

    `approx_percentile` bounds aggregation state at O(accuracy) per
    partial (vs the exact value→count map, a memory cliff on
    mostly-distinct doubles at 100 TB) and guarantees rank error ≤
    n/accuracy, i.e. each bucket's depth is n/n_buckets ± 2n/accuracy.
    Everything around the cutpoint aggregate — broadcast array row,
    map-side fold bucketing, final tiny agg — is byte-identical to the
    exact plan. Deterministic, but no DuckDB GK twin → rows-only in
    the registry; the tolerance contract vs the exact histogram is
    pinned in tests/test_aggregates_approx.py.
    """
    c = F.col(value_col)
    pcts = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = df.agg(
        F.transform(
            F.approx_percentile(c, pcts, F.lit(accuracy)),
            lambda q: F.round(q, 4),
        ).alias("cuts")
    )
    bucketed = df.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cuts"), lambda q: q < c))
        .cast("bigint")
        .alias("bucket"),
        c,
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(c).alias("lo"),
            F.max(c).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# r6: deterministic-sketch forms — same sketch-shaped plans as the
# GK/HLL++ versions above (bounded mergeable state, no exact value→
# count map), but every estimate is exact integer arithmetic on an
# engine-agnostic construction (operators/sketches.py grid + HLL), so
# the registry entries carry full DuckDB oracle twins: the rows-only
# lane closes. The builtin-sketch forms stay as the API for users who
# want Spark's native GK/HLL++ (tolerance-pinned in tests).
# ---------------------------------------------------------------------------


def approx_aggregates_sketch(
    orders: DataFrame, custkey_registers: DataFrame | None = None
) -> DataFrame:
    """approx_aggregates with oracle-checkable estimates: distinct
    customers via the deterministic HLL (±3.3% at m=1024), price
    median/p99 via the deterministic quantile grid (relative error ≤
    2⁻⁵), both in integer cents. One row:
    (approx_customers, approx_median_price_cents, approx_p99_price_cents).

    ``custkey_registers``: optional prebuilt GROUPED o_custkey
    register state (`hll_registers_by_group`, e.g. the monthly table
    `hll_monthly_customers` materializes) — the customer lane then
    rides the merge law (`hll_estimate_global_from_registers`)
    instead of re-scanning orders; bit-identical because per-bucket
    MAX over the groups IS the global register (orders always carry
    a non-NULL o_orderdate)."""
    from .fin import _cents
    from .sketches import (
        hll_deterministic,
        hll_estimate_global_from_registers,
        sketch_quantiles,
    )

    if custkey_registers is not None:
        hll = hll_estimate_global_from_registers(custkey_registers)
    else:
        hll = hll_deterministic(orders, "o_custkey")
    hll = hll.select(F.col("est_distinct").alias("approx_customers"))
    pr = orders.select(_cents("o_totalprice").alias("__v"))
    qs = sketch_quantiles(pr, "__v", [500_000, 990_000])
    piv = qs.agg(
        F.min(F.when(F.col("p_ppm") == 500_000, F.col("est"))).alias(
            "approx_median_price_cents"
        ),
        F.min(F.when(F.col("p_ppm") == 990_000, F.col("est"))).alias(
            "approx_p99_price_cents"
        ),
    )
    return hll.crossJoin(F.broadcast(piv))


def mad_outliers_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    cells: DataFrame | None = None,
) -> DataFrame:
    """mad_outliers with deterministic-grid medians — the oracle-
    checkable 100 TB form: per-group median and MAD estimates ride
    `sketch_quantiles_by_group` (cumulative window PARTITIONED by
    group over ≤ ~3 810 cells per group BY CONSTRUCTION), outlier
    counting is exact on the quantized cents. Same two-broadcast-back
    plan shape as the GK version; the estimates are bit-stable across
    engines. Output: (keys..., med_cents, mad_cents, n, n_outliers).

    ``cells``: optional prebuilt (keys..., cell, cnt) grid state
    (`quantile_grid_cells` over the same quantized column) — the
    median grid then finalizes from shared state instead of
    re-scanning the fact rows (the deviation grid and the outlier
    count still need them)."""
    from .fin import _cents
    from .sketches import (
        sketch_quantiles_by_group,
        sketch_quantiles_by_group_from_cells,
    )

    base = df.select(
        *keys, _cents(value_col).alias("__v")
    ).filter(F.col("__v").isNotNull()).persist()
    # NOTE: base stays persisted for the returned lazy plan (the rfm
    # pattern) — it feeds two grid builds and the final count; the
    # cache is one long per fact row and Spark reclaims it.
    if cells is not None:
        med = sketch_quantiles_by_group_from_cells(
            cells, keys, [500_000]
        ).select(*keys, F.col("est").alias("med_cents"))
    else:
        med = sketch_quantiles_by_group(
            base, "__v", keys, [500_000]
        ).select(*keys, F.col("est").alias("med_cents"))
    j = base.join(F.broadcast(med), keys)
    dev = j.select(
        *keys, F.abs(F.col("__v") - F.col("med_cents")).alias("__d")
    )
    mad = sketch_quantiles_by_group(dev, "__d", keys, [500_000]).select(
        *keys, F.col("est").alias("mad_cents")
    )
    return (
        j.join(F.broadcast(mad), keys)
        .groupBy(*keys, "med_cents", "mad_cents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(
                F.abs(F.col("__v") - F.col("med_cents"))
                > 3 * F.col("mad_cents")
            ).alias("n_outliers"),
        )
    )


def equi_depth_histogram_sketch(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 20,
    cells: DataFrame | None = None,
) -> DataFrame:
    """equi_depth_histogram with deterministic-grid cutpoints — the
    oracle-checkable 100 TB form: cut estimates from the quantile
    grid (bounded mergeable state; depth error ≤ the 2⁻⁵ within-cell
    interpolation), bucketing + per-bucket stats exact on quantized
    cents. Output: (bucket, n, lo_cents, hi_cents).

    ``cells``: optional prebuilt (cell, cnt) grid state over the same
    quantized column — cutpoints then finalize from shared state, and
    only the exact bucketing pass scans the fact rows. A GROUPED cell
    table collapses to the ungrouped one by SUM (the grid merge law),
    so pass e.g. the per-event-type state another query materialized."""
    from .fin import _cents
    from .sketches import sketch_quantiles, sketch_quantiles_from_cells

    base = df.select(_cents(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    ).persist()
    probs = [i * 1_000_000 // n_buckets for i in range(1, n_buckets)]
    if cells is not None:
        flat = cells.groupBy("cell").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        qs = sketch_quantiles_from_cells(flat, probs)
    else:
        qs = sketch_quantiles(base, "__v", probs)
    cuts = qs.agg(F.sort_array(F.collect_list("est")).alias("cuts"))
    v = F.col("__v")
    bucketed = base.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cuts"), lambda q: q < v))
        .cast("bigint")
        .alias("bucket"),
        v,
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("lo_cents"),
            F.max(v).alias("hi_cents"),
        )
        .orderBy("bucket")
    )
