"""KMV / theta sketch properties (operators/sketches.py, r8).

The merge law here is EXACT (k smallest of a union are within the k
smallest of their halves), so unlike grid/HLL the tests assert state
EQUALITY under arbitrary batching, not just estimate closeness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from monzo_data_pipeline_spark.operators.sketches import (
    KMV_K,
    kmv_finalize,
    kmv_merge,
    kmv_state,
    theta_intersect,
)


def _ids(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "v: long")


def test_kmv_exact_below_capacity(spark):
    df = _ids(spark, list(range(100)) * 3)  # duplicates collapse
    out = kmv_finalize(kmv_state(df, "v")).collect()[0]
    assert out.n_state == 100
    assert out.est_distinct == 100  # exact lane


def test_kmv_estimate_accuracy_at_capacity(spark):
    n = 20_000
    out = kmv_finalize(kmv_state(_ids(spark, range(n)), "v")).collect()[0]
    assert out.n_state == KMV_K
    # relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(out.est_distinct - n) / n < 0.25


def test_kmv_merge_law_exact_state_equality(spark):
    df = _ids(spark, range(5_000))
    whole = kmv_state(df, "v")
    parts = [
        kmv_state(df.filter(F.pmod(F.col("v"), F.lit(3)) == i), "v")
        for i in range(3)
    ]
    merged = kmv_merge(*parts)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in whole.collect()
    )
    assert (
        kmv_finalize(merged).collect() == kmv_finalize(whole).collect()
    )


def test_kmv_merge_idempotent(spark):
    s = kmv_state(_ids(spark, range(2_000)), "v")
    twice = kmv_merge(s, s)  # replaying a batch must not move the state
    assert sorted(r.h for r in twice.collect()) == sorted(
        r.h for r in s.collect()
    )


def test_kmv_null_and_empty(spark):
    df = spark.createDataFrame([(None,), (7,)], "v: long")
    out = kmv_finalize(kmv_state(df, "v")).collect()[0]
    assert out.n_state == 1 and out.est_distinct == 1
    empty = kmv_finalize(kmv_state(df.filter("v IS NULL"), "v")).collect()[0]
    assert empty.n_state == 0 and empty.est_distinct == 0


def test_theta_intersect_exact_when_below_capacity(spark):
    a = _ids(spark, range(0, 150))
    b = _ids(spark, range(100, 250))
    out = theta_intersect(
        kmv_state(a, "v"), kmv_state(b, "v")
    ).collect()[0]
    # both sides exact → theta = D → the sample IS the data
    assert out.est_intersect == 50
    assert out.est_union == 250
    assert out.jaccard_ppm == 50 * 1_000_000 // 250


def test_theta_intersect_estimate_at_capacity(spark):
    a = _ids(spark, range(0, 12_000))
    b = _ids(spark, range(6_000, 18_000))
    out = theta_intersect(
        kmv_state(a, "v"), kmv_state(b, "v")
    ).collect()[0]
    assert abs(out.est_intersect - 6_000) / 6_000 < 0.35
    assert abs(out.est_union - 18_000) / 18_000 < 0.25
    assert abs(out.jaccard_ppm / 1e6 - 1 / 3) < 0.12


def test_theta_intersect_disjoint_and_empty(spark):
    a = _ids(spark, range(0, 80))
    b = _ids(spark, range(1_000, 1_080))
    out = theta_intersect(
        kmv_state(a, "v"), kmv_state(b, "v")
    ).collect()[0]
    assert out.est_intersect == 0 and out.jaccard_ppm == 0
    e = theta_intersect(
        kmv_state(a.filter("v < 0"), "v"),
        kmv_state(b.filter("v < 0"), "v"),
    ).collect()[0]
    assert e.est_intersect == 0 and e.est_union == 0
    assert e.jaccard_ppm is None


@pytest.mark.parametrize("k", [16, 64])
def test_kmv_small_k_merge_law(spark, k):
    df = _ids(spark, range(1_000))
    whole = kmv_state(df, "v", k=k)
    merged = kmv_merge(
        kmv_state(df.filter("v % 2 = 0"), "v", k=k),
        kmv_state(df.filter("v % 2 != 0"), "v", k=k),
        k=k,
    )
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in whole.collect()
    )


def test_theta_difference_exact_below_capacity(spark):
    from monzo_data_pipeline_spark.operators.sketches import (
        theta_difference,
    )

    a = _ids(spark, range(0, 150))
    b = _ids(spark, range(100, 250))
    out = theta_difference(
        kmv_state(a, "v"), kmv_state(b, "v")
    ).collect()[0]
    assert out.est_a == 150
    assert out.est_difference == 100  # 0..99
    # identical sets → empty difference; empty A → zero rows out
    same = theta_difference(kmv_state(a, "v"), kmv_state(a, "v"))
    assert same.collect()[0].est_difference == 0


def test_theta_difference_estimate_at_capacity(spark):
    from monzo_data_pipeline_spark.operators.sketches import (
        theta_difference,
    )

    a = _ids(spark, range(0, 12_000))
    b = _ids(spark, range(6_000, 18_000))
    out = theta_difference(
        kmv_state(a, "v"), kmv_state(b, "v")
    ).collect()[0]
    assert abs(out.est_a - 12_000) / 12_000 < 0.3
    assert abs(out.est_difference - 6_000) / 6_000 < 0.4
