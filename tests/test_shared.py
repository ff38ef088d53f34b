"""Session-scoped shared intermediates (ext/shared.py): the memo
builds once and serves bit-identical frames, and every fast path that
rides it (HLL merge-law global estimate, shared grid cells for the
MAD/equi-depth sketches) equals its from-scratch twin exactly."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.ext import shared as SH
from monzo_data_pipeline_spark.operators import aggregates as AGG
from monzo_data_pipeline_spark.operators.sketches import (
    hll_deterministic,
    hll_estimate_global_from_registers,
    hll_registers_by_group,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_shared_frame_builds_once_and_roundtrips(spark, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )

    a = SH.shared_frame(spark, "test::builds_once", build)
    b = SH.shared_frame(spark, "test::builds_once", build)
    assert len(calls) == 1
    assert _rows(a) == _rows(b) == [(i, 3 * i) for i in range(10)]


def test_shared_frame_concurrent_single_build(spark):
    calls = []
    results = []

    def build():
        calls.append(1)
        return spark.range(5).select(F.col("id").alias("k"))

    def worker():
        df = SH.shared_frame(spark, "test::concurrent", build)
        results.append(_rows(df))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert all(r == [(i,) for i in range(5)] for r in results)


def test_hll_global_from_grouped_registers_matches_direct(spark, sf_dir):
    """The merge law approx_aggregates rides: per-bucket MAX over the
    monthly register groups == the ungrouped registers, so the global
    estimate finalized from grouped state is bit-identical to
    hll_deterministic on the same rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("g"), "o_custkey"
    )
    direct = hll_deterministic(o, "o_custkey")
    regs = hll_registers_by_group(o, "o_custkey", "g")
    via_merge = hll_estimate_global_from_registers(regs)
    assert _rows(direct) == _rows(via_merge)


def test_equi_depth_from_shared_cells_matches_scratch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cells = SH.events_value_cells_by_type(spark, sf_dir)
    scratch = AGG.equi_depth_histogram_sketch(ev, "value", n_buckets=20)
    fast = AGG.equi_depth_histogram_sketch(
        ev, "value", n_buckets=20, cells=cells
    )
    assert _rows(scratch) == _rows(fast)


def test_mad_from_shared_cells_matches_scratch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cells = SH.events_value_cells_by_type(spark, sf_dir)
    scratch = AGG.mad_outliers_sketch(ev, ["event_type"], "value")
    fast = AGG.mad_outliers_sketch(ev, ["event_type"], "value", cells=cells)
    assert _rows(scratch) == _rows(fast)


def test_kmeans_from_shared_assignment_matches_scratch(spark, sf_dir):
    from monzo_data_pipeline_spark.ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = SH.kmeans_assignment_8_3(spark, sf_dir)
    for fn in (SIM.kmeans_cluster_profile, SIM.kmeans_representatives):
        scratch = fn(emb, k=8, iters=3)
        fast = fn(emb, k=8, iters=3, assigned=assigned)
        assert _rows(scratch) == _rows(fast)


def test_approx_aggregates_from_shared_registers_matches_scratch(
    spark, sf_dir
):
    o = load_table(spark, sf_dir, "orders")
    regs = SH.orders_custkey_monthly_registers(spark, sf_dir)
    scratch = AGG.approx_aggregates_sketch(o)
    fast = AGG.approx_aggregates_sketch(o, custkey_registers=regs)
    assert _rows(scratch) == _rows(fast)


def test_theta_queries_from_shared_kmv_state_match_scratch(spark, sf_dir):
    """r8: the memoized per-priority KMV states feeding BOTH theta
    queries are bit-identical to from-scratch builds, so intersection
    and difference results are too."""
    import pyspark.sql.functions as F

    from monzo_data_pipeline_spark.operators.sketches import (
        kmv_state,
        theta_difference,
        theta_intersect,
    )
    from monzo_data_pipeline_spark.registry import queries

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    sa = kmv_state(
        o.filter(F.col("o_orderpriority") == "1-URGENT"), "o_custkey"
    )
    sb = kmv_state(
        o.filter(F.col("o_orderpriority") == "5-LOW"), "o_custkey"
    )
    q = queries()
    assert _rows(q["theta_intersect_customers"](spark, sf_dir)) == _rows(
        theta_intersect(sa, sb)
    )
    assert _rows(q["theta_diff_customers"](spark, sf_dir)) == _rows(
        theta_difference(sa, sb)
    )
