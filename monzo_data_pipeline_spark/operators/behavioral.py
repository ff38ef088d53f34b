"""Behavioral / event-log analytics shapes: SCD2 interval builds,
funnel conversion, cohort retention.

The reference's append-only snapshot tables (`bronze_balance`,
`bronze_pots` — /root/reference/src/sql/create_bronze_layer.sql:37-65,
a new row per run stamped `date_retrieved`) are exactly a slowly-
changing change log; its notebook reads "current state" as
ORDER BY date_retrieved DESC (notebooks/query_sqlite_db.ipynb). These
operators generalize that snapshot log into the three standard
warehouse derivations:

  * SCD2 intervals — each change becomes a [valid_from, valid_to)
    validity row (the reference's first-wins INSERT OR IGNORE is SCD0;
    latest-snapshot is SCD1; this is the full-history type 2);
  * funnel — staged conversion with "after previous stage" ordering;
  * cohort retention — first-activity cohort × activity-offset grid.

Scale posture: every one of these is a single shuffle on user_id (the
window / groupBy key) plus integer arithmetic — no UDFs, no iteration.
Skewed power-users are the classic hazard for the per-user window;
AQE skew-split handles the join/agg side, and the window's
partition-by key is the natural salt boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Build SCD Type-2 validity intervals from a keyed change log:
    valid_from = change ts, valid_to = next change's ts (open-ended
    for the current row). One window shuffle on the key."""
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(tiebreak))
    return (
        changes.withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts, "valid_from")
    )


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """Strictly-ordered 3-stage funnel: a user converts stage i only
    with an event strictly after their stage-(i-1) conversion time.

    Plan: one conditional agg for stage 1, then for each later stage a
    co-partitioned join (user key) + min agg — all shuffles are on the
    same user key, so Catalyst reuses the partitioning; no window over
    the full event log, no UDFs.
    """
    s1, s2, s3 = stages
    first1 = (
        events.filter(F.col(etype) == s1)
        .groupBy(user)
        .agg(F.min(ts).alias("t1"))
    )
    first2 = (
        events.filter(F.col(etype) == s2)
        .join(first1, user)
        .filter(F.col(ts) > F.col("t1"))
        .groupBy(user)
        .agg(F.min(ts).alias("t2"))
    )
    first3 = (
        events.filter(F.col(etype) == s3)
        .join(first2, user)
        .filter(F.col(ts) > F.col("t2"))
        .groupBy(user)
        .agg(F.min(ts).alias("t3"))
    )
    return (
        first1.agg(F.count(F.lit(1)).alias(f"n_{s1}"))
        .join(first2.agg(F.count(F.lit(1)).alias(f"n_{s2}")))
        .join(first3.agg(F.count(F.lit(1)).alias(f"n_{s3}")))
    )


def transition_counts(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    (from_type, to_type, n, prob_q) where prob_q = ⌊1e6·n/total⌋.

    One window shuffle on the user key builds the (event, next-event)
    pairs; the per-from totals are a tiny agg broadcast back. The
    probability stays in integer arithmetic (bigint DIV) — no float
    division, so partial-agg order and engine can't change it.
    """
    w = Window.partitionBy(user).orderBy(F.asc(ts), F.asc(tiebreak))
    pairs = (
        events.withColumn("to_type", F.lead(etype).over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col(etype).alias("from_type"), "to_type")
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .withColumn("prob_q", F.expr("CAST((n * 1000000) DIV total AS BIGINT)"))
        .select("from_type", "to_type", "n", "prob_q")
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 15,
    top_k: int = 20,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Top-k most common within-session event-type paths ('view>click>…').

    Sessionization is the same lag/cumsum split the sessionization
    oracle encodes (new session when the gap STRICTLY exceeds the
    threshold). The path string is built from an array_sort'd
    (ts, tiebreak, type) struct list — collect_list order is
    partition-dependent, the sort makes it total — then one corpus-wide
    count. Shuffles: user key (window), (user, sid) agg, path agg.
    """
    w = Window.partitionBy(user).orderBy(F.asc(ts), F.asc(tiebreak))
    # µs-precision gap: cast-to-long would floor to seconds and split
    # sub-second boundary cases differently from an INTERVAL compare
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    numbered = events.withColumn(
        "sid",
        F.sum(
            F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = numbered.groupBy(user, "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts).alias("t"),
                            F.col(tiebreak).alias("tb"),
                            F.col(etype).alias("e"),
                        )
                    )
                ),
                lambda x: x["e"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_k)
    )


def cohort_retention(
    events: DataFrame, user: str = "user_id", ts: str = "ts"
) -> DataFrame:
    """Daily retention triangle: cohort = first active day per user;
    one row per (cohort_day, offset_days) with the distinct-user count.

    Two aggs on the user key + one on the (cohort, offset) pair; the
    (user, day) distinct is exact (it IS the activity grain), not an
    approx sketch, because retention ratios feed product decisions.
    """
    activity = events.select(
        F.col(user), F.to_date(ts).alias("activity_day")
    ).distinct()
    cohorts = activity.groupBy(user).agg(F.min("activity_day").alias("cohort_day"))
    return (
        activity.join(cohorts, user)
        .select(
            "cohort_day",
            F.datediff("activity_day", "cohort_day").alias("offset_days"),
            F.col(user),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def scd2_lookup(
    facts: DataFrame,
    dim_intervals: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attrs: tuple[str, ...] = ("dim_value",),
) -> DataFrame:
    """Temporal dimension lookup: enrich each fact with the SCD2 dim
    attributes valid at the fact's event time (valid_from ≤ ts <
    valid_to, open-ended current row matches everything after
    valid_from; facts before the first interval keep NULL attrs).

    The join keeps an EQUALITY on the key, so Catalyst plans a hash /
    sort-merge join on the key with the interval containment as a
    residual condition — never a nested loop. Intervals partition time
    per key by construction (scd2_intervals), so at most one dim row
    matches and no post-join dedup is needed. At 100 TB: dim broadcasts
    when small; otherwise both sides shuffle once on the key.
    """
    # rename the dim-side key before the join: when facts and dim
    # derive from the same lineage, facts[key] == dim[key] degenerates
    # to a trivially-true predicate and Spark falls back to dataset-id
    # disambiguation heuristics — an explicit distinct name keeps the
    # condition unambiguous under failAmbiguousSelfJoin and plan changes
    dim = dim_intervals.select(
        F.col(key).alias("__dim_key"), "valid_from", "valid_to", *attrs
    )
    cond = (
        (facts[key] == dim["__dim_key"])
        & (dim["valid_from"] <= facts[ts])
        & (dim["valid_to"].isNull() | (facts[ts] < dim["valid_to"]))
    )
    return facts.join(dim, cond, "left").select(
        *[facts[c] for c in facts.columns], "valid_from", *attrs
    )


def compress_changes(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """SCD2 change compression: drop rows whose value equals the
    previous value for the key, keeping only genuine change points —
    the standard pre-pass before interval building (a snapshot log
    mostly restates unchanged state; intervals built from raw
    snapshots are artificially fragmented).

    Null-safe compare (eqNullSafe) so NULL→NULL is "unchanged" and
    NULL→x / x→NULL are changes. One window shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(tiebreak))
    prev = F.lag(value).over(w)
    is_first = F.lag(ts).over(w).isNull()
    return (
        df.withColumn("__same", F.col(value).eqNullSafe(prev) & ~is_first)
        .filter(~F.col("__same"))
        .drop("__same")
    )


def multi_touch_attribution(
    touches: DataFrame,
    purchases: DataFrame,
    max_gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution — each purchase's credit is
    split EQUALLY across every touch (view/click/…) by the same user
    in the preceding ``max_gap_seconds`` window, per-channel totals
    out. The multi-touch twin of the last-touch interval join
    (streaming/joins.py::attribute_purchases).

    Exact-integer credit: each touch earns ``10⁶ DIV n`` ppm and the
    EARLIEST touch (ts, id tiebreak) additionally carries the
    ``10⁶ MOD n`` remainder, so every purchase's credit sums to
    exactly 10⁶ — no float shares, bit-identical across engines and
    partitionings.

    Plan: one equi-join on the user with the time window as residual
    (hash join, never a nested loop), one purchase-grain agg for
    (n, first touch) joined back, one channel-grain agg out.
    """
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(channel_col).alias("__ch"),
    )
    p = purchases.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__pts"),
        F.col(id_col).alias("__pid"),
    )
    joined = p.join(t, on="__u").filter(
        (F.col("__tts") <= F.col("__pts"))
        & (
            F.col("__tts")
            >= F.col("__pts") - F.expr(f"INTERVAL {max_gap_seconds} SECOND")
        )
    )
    per_p = joined.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct("__tts", "__tid")).alias("__first"),
    )
    credited = joined.join(per_p, on="__pid").select(
        "__ch",
        F.expr("1000000 DIV __n").alias("__base"),
        F.when(
            (F.col("__tts") == F.col("__first.__tts"))
            & (F.col("__tid") == F.col("__first.__tid")),
            F.expr("1000000 % __n"),
        )
        .otherwise(F.lit(0))
        .alias("__rem"),
    )
    return (
        credited.groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.col("__base") + F.col("__rem")).alias("credit_ppm"),
        )
        .orderBy("channel")
    )


def conversion_latency(
    touches: DataFrame,
    purchases: DataFrame,
    max_gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for each purchase, the latency in
    whole seconds from its FIRST touch (ts, id tiebreak) inside the
    preceding ``max_gap_seconds`` window, summarized per first-touch
    channel as exact interpolated percentiles (the exact_percentiles
    idiom: round(…, 4) absorbs the engines' algebraically-equivalent
    but FP-different interpolation).

    Same join shape as multi_touch_attribution (user equi-join, time
    window residual, purchase-grain min-struct agg) — one extra
    integer subtraction, no new shuffle class. Purchases with no
    in-window touch are absent (they have no latency).
    """
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(channel_col).alias("__ch"),
    )
    p = purchases.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__pts"),
        F.col(id_col).alias("__pid"),
    )
    joined = p.join(t, on="__u").filter(
        (F.col("__tts") <= F.col("__pts"))
        & (
            F.col("__tts")
            >= F.col("__pts") - F.expr(f"INTERVAL {max_gap_seconds} SECOND")
        )
    )
    per_p = joined.groupBy("__pid").agg(
        F.min(F.struct("__tts", "__tid", "__ch")).alias("__first"),
        F.max("__pts").alias("__p_ts"),
    )
    lat = per_p.select(
        F.col("__first.__ch").alias("channel"),
        F.expr(
            "(unix_micros(`__p_ts`) - unix_micros(`__first`.`__tts`))"
            " DIV 1000000"
        ).alias("__lat_s"),
    )
    return (
        lat.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.round(F.percentile("__lat_s", F.lit(0.5)), 4).alias("median_s"),
            F.round(F.percentile("__lat_s", F.lit(0.9)), 4).alias("p90_s"),
        )
        .orderBy("channel")
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_window_days: int = 7,
    horizons: tuple[int, ...] = (7, 30, 60, 90),
) -> DataFrame:
    """Kaplan-Meier churn survival at fixed horizons — "what share of
    users are still active after h days" with RIGHT-CENSORING done
    properly: a user whose last event falls within
    ``censor_window_days`` of the log's end hasn't churned, they've
    just run out of observation window, and counting them as churned
    (the naive retention query) biases survival down. KM removes them
    from the risk set at their censor time instead.

    Per user: duration = datediff(last event day, first event day);
    censored iff last event ≥ global max ts − censor window. Estimator
    S(h) = Π_{t ≤ h} (1 − d_t / n_t) with d_t churns at duration t and
    n_t the at-risk count just before t (deaths-before-censorings tie
    convention: censors at t leave the risk set AFTER t's factor).

    Determinism: d_t / n_t / N are exact integers; the only IEEE is
    the factor product itself, folded over durations ASCENDING in one
    fixed order (the ks_drift single-row fold — both engines multiply
    the identical double sequence, then one floor to ppm).

    Plan: one user-grain agg (shuffle on user), 1-row global-max
    broadcast, one duration-grain agg (≤ day-span rows, bounded by
    calendar not data), one single-row fold. NO window anywhere on the
    Spark side; no per-row work after the duration grain. Empty input
    → one row of zeros with NULL ppms."""
    per_user = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).groupBy(user_col).agg(
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
    )
    gmax = F.broadcast(per_user.agg(F.max("__last").alias("__gmax")))
    users = per_user.crossJoin(gmax).select(
        F.datediff(F.to_date("__last"), F.to_date("__first")).alias(
            "__dur"
        ),
        (
            F.col("__last")
            >= F.col("__gmax") - F.expr(f"INTERVAL {censor_window_days} DAY")
        ).alias("__cens"),
    )
    grain = users.groupBy("__dur").agg(
        F.sum(F.when(~F.col("__cens"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
        F.sum(F.when(F.col("__cens"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    row = grain.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__dur").alias("t"), "d", "c"))
        ).alias("days"),
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_users"),
        F.sum("d").cast("long").alias("n_churned"),
        F.sum("c").cast("long").alias("n_censored"),
    )
    init = F.struct(
        F.coalesce(F.col("n_users"), F.lit(0))
        .cast("double")
        .alias("rem"),
        *[F.lit(1.0).alias(f"s{h}") for h in horizons],
    )

    def step(acc, x):
        factor = F.when(
            acc["rem"] > 0.0,
            F.lit(1.0) - x["d"].cast("double") / acc["rem"],
        ).otherwise(F.lit(1.0))
        fields = [
            (acc["rem"] - x["d"].cast("double") - x["c"].cast("double"))
            .alias("rem")
        ]
        for h in horizons:
            fields.append(
                F.when(x["t"] <= F.lit(h), acc[f"s{h}"] * factor)
                .otherwise(acc[f"s{h}"])
                .alias(f"s{h}")
            )
        return F.struct(*fields)

    folded = F.aggregate("days", init, step)
    ok = F.col("n_users") > 0
    out_cols = [
        F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias(
            "n_users"
        ),
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias(
            "n_churned"
        ),
        F.coalesce(F.col("n_censored"), F.lit(0)).cast("long").alias(
            "n_censored"
        ),
    ]
    for h in horizons:
        out_cols.append(
            F.when(
                ok,
                F.floor(folded[f"s{h}"] * F.lit(1000000.0)).cast("long"),
            ).alias(f"s{h}_ppm")
        )
    return row.select(*out_cols)
