"""Deterministic quantile grid (operators/sketches.py, r6): the
hll_deterministic pattern for quantiles — cross-engine cell equality,
estimate accuracy vs exact order statistics, and the three converted
registry shapes' tolerance contracts."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.operators.sketches import (
    grid_cell_expr,
    grid_lo_w_exprs,
    sketch_quantiles,
    sketch_quantiles_by_group,
)

ADVERSARIAL = [
    0, 1, 31, 32, 33, 63, 64, 65, 1000,
    2**40 - 1, 2**40, 2**40 + 12345,
    2**62 - 1, 2**62, 2**63 - 1,
    -1, -31, -32, -33, -64, -12345,
    -(2**40), -(2**62), -(2**63) + 1, -(2**63),
]


def test_grid_cells_identical_across_engines(spark):
    """Cell index + decoded (lo, w) must be BIT-IDENTICAL between the
    Spark and DuckDB expression dialects on boundary-adversarial
    values (powers of two, sub-bin edges, the int64 extremes)."""
    con = duckdb.connect()
    lits = ",".join(
        f"({v}::BIGINT)"
        if v != -(2**63)
        else "((-9223372036854775807::BIGINT) - 1)"
        for v in ADVERSARIAL
    )
    con.sql(f"CREATE TABLE t AS SELECT * FROM (VALUES {lits}) AS t(v)")
    cell_d = grid_cell_expr("v", "duckdb")
    lo_d, w_d = grid_lo_w_exprs("cell", "duckdb")
    duck = con.sql(
        f"SELECT v, CAST(cell AS BIGINT) AS cell,"
        f" CAST({lo_d} AS BIGINT) AS lo, CAST({w_d} AS BIGINT) AS w"
        f" FROM (SELECT v, {cell_d} AS cell FROM t) ORDER BY v"
    ).fetchall()

    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "v bigint")
    cell_s = grid_cell_expr("v", "spark")
    lo_s, w_s = grid_lo_w_exprs("cell", "spark")
    got = (
        df.select("v", F.expr(cell_s).alias("cell"))
        .select("v", "cell", F.expr(lo_s).alias("lo"), F.expr(w_s).alias("w"))
        .orderBy("v")
        .collect()
    )
    assert [tuple(r) for r in got] == duck

    # containment (post-clamp) + monotonicity
    prev = None
    for v, cell, lo, w in duck:
        vc = max(min(v, 2**62), -(2**62))
        assert lo <= vc <= lo + w - 1, (v, cell, lo, w)
        assert prev is None or cell >= prev
        prev = cell


def test_sketch_quantiles_within_relative_bound(spark):
    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [
            rng.integers(-1000, 100000, 5000),
            rng.integers(0, 30, 500),  # |v| < 32: exact unit cells
            (rng.pareto(1.2, 1000) * 1e6).astype(np.int64),  # heavy tail
        ]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "v bigint")
    probs = [10_000, 250_000, 500_000, 750_000, 990_000]
    out = {r.p_ppm: r.est for r in sketch_quantiles(df, "v", probs).collect()}
    sv = np.sort(vals)
    n = len(sv)
    for p in probs:
        r = (p * (n - 1)) // 1_000_000
        true = int(sv[r])
        rel = abs(out[p] - true) / max(abs(true), 1)
        assert rel <= 2**-5 + 1e-9, (p, true, out[p], rel)


def test_sketch_quantiles_by_group_and_empty(spark):
    rng = np.random.default_rng(11)
    rows = [("a", int(v)) for v in rng.integers(0, 10_000, 2000)] + [
        ("b", int(v)) for v in rng.integers(-5000, 0, 1500)
    ]
    gdf = spark.createDataFrame(rows, "g string, v bigint")
    out = {
        (r.g, r.p_ppm): r.est
        for r in sketch_quantiles_by_group(
            gdf, "v", ["g"], [250_000, 500_000]
        ).collect()
    }
    for g in ("a", "b"):
        sel = np.sort([v for gg, v in rows if gg == g])
        for p in (250_000, 500_000):
            r = (p * (len(sel) - 1)) // 1_000_000
            true = int(sel[r])
            assert abs(out[(g, p)] - true) <= max(abs(true), 1) * 2**-5 + 1

    empty = spark.createDataFrame([], "v bigint")
    got = sketch_quantiles(empty, "v", [500_000]).collect()
    assert [(r.p_ppm, r.est) for r in got] == [(500_000, None)]


def test_equi_depth_sketch_bucket_depths(spark):
    from monzo_data_pipeline_spark.operators.aggregates import (
        equi_depth_histogram_sketch,
    )

    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 500, 20_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    out = equi_depth_histogram_sketch(df, "value", n_buckets=20).collect()
    total = sum(r.n for r in out)
    assert total == 20_000
    # equi-depth contract under the 2^-5 grid: each bucket within a
    # loose multiple of the ideal depth (cut error concentrates rows
    # into neighbors, never loses them)
    for r in out:
        assert r.n <= 20_000 // 20 * 3
    # buckets ordered, bounds consistent
    assert [r.bucket for r in out] == sorted(r.bucket for r in out)
    for r in out:
        assert r.lo_cents <= r.hi_cents


def test_mad_sketch_close_to_exact(spark):
    from monzo_data_pipeline_spark.operators.aggregates import (
        mad_outliers,
        mad_outliers_sketch,
    )

    rng = np.random.default_rng(7)
    rows = [
        ("x", float(v)) for v in rng.normal(100, 10, 4000)
    ] + [("y", float(v)) for v in rng.normal(50, 25, 4000)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r.event_type: r
        for r in mad_outliers_sketch(df, ["event_type"], "value").collect()
    }
    exact = {
        r.event_type: r
        for r in mad_outliers(df, ["event_type"], "value").collect()
    }
    for g in ("x", "y"):
        med_exact = float(exact[g].med_r) * 100
        mad_exact = float(exact[g].mad_r) * 100
        assert abs(got[g].med_cents - med_exact) <= max(med_exact, 1) * 0.04
        assert abs(got[g].mad_cents - mad_exact) <= max(mad_exact, 1) * 0.06
        assert got[g].n == exact[g].n


def test_grid_cells_merge_equals_whole(spark):
    """Mergeability: per-batch grid states summed == the whole-data
    state, so quantile extraction over merged state is identical to a
    full recompute — the property that makes the sketch a valid
    incremental/streaming checkpoint."""
    import numpy as np

    from monzo_data_pipeline_spark.operators.sketches import (
        merge_grid_cells,
        quantile_grid_cells,
    )

    rng = np.random.default_rng(17)
    vals = [int(v) for v in rng.integers(-10_000, 10_000_000, 6000)]
    a = spark.createDataFrame([(v,) for v in vals[:2500]], "v bigint")
    b = spark.createDataFrame([(v,) for v in vals[2500:]], "v bigint")
    whole = spark.createDataFrame([(v,) for v in vals], "v bigint")

    merged = {
        (r.cell, r.cnt)
        for r in merge_grid_cells(
            quantile_grid_cells(a, "v"), quantile_grid_cells(b, "v")
        ).collect()
    }
    full = {
        (r.cell, r.cnt)
        for r in quantile_grid_cells(whole, "v").collect()
    }
    assert merged == full
    # merging the same batch twice is NOT idempotent (counts add) —
    # unlike HLL/bitmap; assert the doubling so nobody assumes it
    doubled = {
        (r.cell, r.cnt)
        for r in merge_grid_cells(
            quantile_grid_cells(a, "v"), quantile_grid_cells(a, "v")
        ).collect()
    }
    assert doubled == {
        (c, 2 * n)
        for c, n in (
            (r.cell, r.cnt) for r in quantile_grid_cells(a, "v").collect()
        )
    }
