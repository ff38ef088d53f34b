"""Plan-contract tests for bucketed layout: the whole point of
bucketing is the ABSENCE of Exchange nodes, so that is what we assert.
Correctness is cross-checked against the plain (shuffling) join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.sources.bucketing import (
    bucketed_equi_join,
    count_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{db_dir}'")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "bucketdb.orders_b", ["o_orderkey"], 8)
    write_bucketed(li, "bucketdb.lineitem_b", ["l_orderkey"], 8)
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    joined = bucketed_equi_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    agg = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity")).alias("qty"),
    )
    # the join itself: both sides bucketed on the key → zero shuffles
    assert count_exchanges(joined) == 0, joined._jdf.queryExecution().executedPlan()
    # the groupBy on a NON-bucket key shuffles once (the agg), never the join
    assert count_exchanges(agg) <= 1


def test_bucketed_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    _, lt = bucketed_tables
    per_order = (
        spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    )
    assert count_exchanges(per_order) == 0


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        bucketed_equi_join(spark, lt, ot, "l_orderkey", "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """Equality on the bucket column selects 1 of 8 buckets at scan time.

    autoBucketedScan (default on) drops bucket layout from plans that
    don't *join/agg* on the key, which also forfeits pruning — for
    point-lookup-shaped queries the bucketed scan must be kept on.
    """
    _, lt = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        one_key = spark.table(lt).filter(F.col("l_orderkey") == 42)
        plan = one_key._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(key, prev)
