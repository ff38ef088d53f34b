"""Tolerance contracts for the approx robust-stats twins.

The exact operators (equi_depth_histogram, mad_outliers) are
oracle-checked; these tests pin the approx variants to them:
approx_percentile's guaranteed rank error is ≤ n/accuracy, so with
accuracy=10_000 over ~6k events (sf0.001) the sketch is effectively
exact, and at any n each bucket depth is n/n_buckets ± 2n/accuracy.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.catalog import load_table  # noqa: E402
from monzo_data_pipeline_spark.operators import aggregates as AGG  # noqa: E402


def test_equi_depth_histogram_approx_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    n_buckets, accuracy = 20, 10_000
    rows = {
        r.bucket: r.n
        for r in AGG.equi_depth_histogram_approx(
            ev, "value", n_buckets=n_buckets, accuracy=accuracy
        ).collect()
    }
    assert set(rows) == set(range(n_buckets))
    tol = max(2 * n // accuracy, 2)  # ± 2·n/accuracy, floor of 2 for ties
    target = n / n_buckets
    for b, depth in rows.items():
        assert abs(depth - target) <= target * 0.1 + tol, (b, depth, target)
    assert sum(rows.values()) == n  # partition of the input


def test_equi_depth_histogram_approx_matches_exact_at_high_accuracy(
    spark, sf_dir
):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r.bucket, r.n)
        for r in AGG.equi_depth_histogram(ev, "value", n_buckets=10).collect()
    }
    # accuracy >> n → the GK sketch retains every value → identical cuts
    approx = {
        (r.bucket, r.n)
        for r in AGG.equi_depth_histogram_approx(
            ev, "value", n_buckets=10, accuracy=1_000_000
        ).collect()
    }
    assert approx == exact


def test_mad_outliers_approx_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in AGG.mad_outliers(ev, ["event_type"], "value").collect()
    }
    approx = {
        r.event_type: r
        for r in AGG.mad_outliers_approx(
            ev, ["event_type"], "value", accuracy=10_000
        ).collect()
    }
    assert set(exact) == set(approx)
    for et, ex in exact.items():
        ap = approx[et]
        assert ap.n == ex.n
        # med/MAD within the rank-error neighborhood → relative slack
        assert abs(ap.med_r - ex.med_r) <= max(0.05 * abs(ex.med_r), 1e-3)
        assert abs(ap.mad_r - ex.mad_r) <= max(0.05 * abs(ex.mad_r), 1e-3)
        # outlier counts may differ by the rows near the 3·MAD boundary
        assert abs(ap.n_outliers - ex.n_outliers) <= max(
            0.02 * ex.n, 5
        ), (et, ap.n_outliers, ex.n_outliers)


def test_approx_registry_entries_run(spark, sf_dir):
    from monzo_data_pipeline_spark.registry import queries

    q = queries()
    assert q["equi_depth_histogram_approx"](spark, sf_dir).count() > 0
    assert q["mad_robust_outliers_approx"](spark, sf_dir).count() > 0


# ---------------------------------------------------------------------------
# hll_deterministic (r5): oracle-checkable HyperLogLog


def test_hll_accuracy_and_duplicate_insensitivity(spark):
    from monzo_data_pipeline_spark.operators import sketches as SK

    n = 40_000
    df = spark.createDataFrame(
        [(i * 7 + 13,) for i in range(n)], "k long"
    )
    r = SK.hll_deterministic(df, "k").collect()[0]
    # raw estimator, m=1024: ~1.04/sqrt(m) = 3.3% typical error;
    # allow 4 sigma
    assert abs(r["est_distinct"] - n) / n < 0.13
    # duplicating every row must not move the estimate at all
    dup = df.union(df).union(df)
    r2 = SK.hll_deterministic(dup, "k").collect()[0]
    assert r2["est_distinct"] == r["est_distinct"]
    assert r2["buckets_seen"] == r["buckets_seen"]


def test_hll_partition_invariance_and_empty(spark):
    from monzo_data_pipeline_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(i * 31 + 5,) for i in range(15_000)], "k long"
    )
    a = SK.hll_deterministic(df, "k").collect()[0]
    b = SK.hll_deterministic(df.repartition(17), "k").collect()[0]
    assert a.asDict() == b.asDict()
    empty = SK.hll_deterministic(df.filter("k < 0"), "k").collect()[0]
    assert (empty["buckets_seen"], empty["est_distinct"]) == (0, None)


def test_hll_negative_keys_and_python_mirror(spark):
    """Pin the full construction against a bit-exact python mirror —
    the same check the oracle runs, but with negative ids exercising
    the pmod path."""
    import random

    from monzo_data_pipeline_spark.operators import sketches as SK

    rng = random.Random(53)
    keys = [rng.randint(-10**9, 10**9) for _ in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = SK.hll_deterministic(df, "k").collect()[0]
    M = 2_147_483_647
    regs = {}
    for v in set(keys):
        x = v % M  # python % is already non-negative for positive M
        h = (x * 2_654_435_761 % M) * 2_147_483_648 + (
            x * 40_503 + 12_345
        ) % M
        b, w = h & 1023, h >> 10
        rho = (((w & -w) - 1).bit_count() + 1) if w > 0 else 53
        regs[b] = max(regs.get(b, 0), rho)
    seen = len(regs)
    ssum = sum((1 << (63 - r)) * 2 for r in regs.values())
    est = (720_539 * 1024 * 1024 * (1 << 64)) // (
        (ssum + (1024 - seen) * (1 << 64)) * 1_000_000
    )
    assert got["buckets_seen"] == seen
    assert got["est_distinct"] == est


def test_hll_by_group_matches_global_per_group(spark):
    """Each group's grouped-HLL row must equal hll_deterministic run
    on that group alone — the register table is just partitioned by
    the group key."""
    from pyspark.sql import functions as F

    from monzo_data_pipeline_spark.operators import sketches as SK

    rows = [(g, g * 100_000 + i * 7) for g in (1, 2, 3) for i in range(3000 * g)]
    df = spark.createDataFrame(rows, "g int, k long")
    grouped = {
        r["g"]: r for r in SK.hll_deterministic_by_group(df, "k", "g").collect()
    }
    assert set(grouped) == {1, 2, 3}
    for g in (1, 2, 3):
        solo = SK.hll_deterministic(df.filter(F.col("g") == g), "k").collect()[0]
        assert grouped[g]["est_distinct"] == solo["est_distinct"]
        assert grouped[g]["buckets_seen"] == solo["buckets_seen"]
    # null group keys are excluded, not a lane
    withnull = df.union(spark.createDataFrame([(None, 1)], "g int, k long"))
    assert SK.hll_deterministic_by_group(withnull, "k", "g").count() == 3
