"""Bucketed co-located join (sources/io.py::write_bucketed_table, r9).

The contract is PHYSICAL: both sides bucketed by the join key into
the same bucket count read pre-distributed, so the join plans with
zero shuffle exchanges — the pay-the-shuffle-once-at-write-time
lakehouse pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.sources.io import write_bucketed_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed_table(
        o, "t_bkt_o", "o_orderkey", 8, location=str(tmp_path / "o")
    )
    write_bucketed_table(
        li, "t_bkt_l", "l_orderkey", 8, location=str(tmp_path / "l")
    )
    try:
        ob, lb = spark.table("t_bkt_o"), spark.table("t_bkt_l")
        # merge hint = the both-sides-large regime bucketing exists
        # for (AQE otherwise broadcasts the small test-side)
        joined = ob.join(
            lb.hint("merge"), ob["o_orderkey"] == lb["l_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result matches the plain (shuffling) join
        want = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_o")
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")


def test_bucketed_aggregate_no_exchange_on_bucket_key(
    spark, sf_dir, tmp_path
):
    """A groupBy on the bucket key of a bucket-sorted table also
    avoids the aggregation exchange."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(
        o, "t_bkt_o2", "o_orderkey", 8, location=str(tmp_path / "o2")
    )
    try:
        ob = spark.table("t_bkt_o2")
        agg = ob.groupBy("o_orderkey").agg(
            F.sum("o_totalprice").alias("s")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == o.select("o_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_o2")
