"""Unit tests per operator module (SURVEY.md §5 strategy #2):
hermetic, tiny inline fixtures mirroring the reference's shapes."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from monzo_data_pipeline_spark.operators import (
    aggregates as AGG,
    dedup as DD,
    filters as FL,
    joins as JN,
    projection as PJ,
    setops as SO,
    windows as WN,
)
from monzo_data_pipeline_spark.functions import text as TX


def test_flatten_struct_null_safe(spark):
    # reference api_client.py:59-77 hand-builds an all-None template for
    # missing merchants; Spark struct access must be null-safe instead
    df = spark.createDataFrame(
        [
            Row(id="a", merchant=Row(name="M1", city="London")),
            Row(id="b", merchant=None),
        ],
        "id string, merchant struct<name string, city string>",
    )
    flat = PJ.flatten_struct(df, "merchant")
    rows = {r.id: r for r in flat.collect()}
    assert rows["a"].merchant_name == "M1"
    assert rows["b"].merchant_name is None and rows["b"].merchant_city is None


def test_default_fill(spark):
    df = spark.createDataFrame([(1, None), (2, True)], "id int, is_load boolean")
    out = {r.id: r.is_load for r in PJ.default_fill(df, {"is_load": False}).collect()}
    assert out == {1: False, 2: True}


def test_anti_join_idempotence(spark):
    incoming = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    existing = spark.createDataFrame([("a", 99)], "id string, v int")
    new = DD.anti_join_new_rows(incoming, existing, ["id"])
    assert [r.id for r in new.collect()] == ["b"]
    # re-merging the merged result appends nothing (A11 idempotence)
    merged = existing.unionByName(new)
    again = DD.anti_join_new_rows(incoming, merged, ["id"])
    assert again.count() == 0


def test_first_wins_dedup_deterministic(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-02", "late"), ("k", "2024-01-01", "early")],
        "id string, arrived string, payload string",
    )
    out = DD.first_wins_dedup(df, ["id"], ["arrived"]).collect()
    assert len(out) == 1 and out[0].payload == "early"


def test_distinct_entities_not_null(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (None, "y")], "k int, name string"
    )
    out = DD.distinct_entities(df, ["k", "name"], not_null=["k"]).collect()
    assert len(out) == 1 and out[0].k == 1


def test_top_k_deterministic(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id int, v int")
    out = FL.top_k(df, ["v", "id"], k=5).collect()
    assert [r.id for r in out] == [29, 26, 23, 20, 17]


def test_fk_join_broadcast(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "k int, v int")
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "dk int, name string")
    out = JN.fk_join(
        fact, [(dim.withColumnRenamed("dk", "v"), "v")], how="left"
    ).collect()
    names = {r.k: r.name for r in out}
    assert names == {1: "a", 2: "b", 3: None}
    # the physical plan actually broadcasts the dim
    plan = JN.fk_join(fact, [(dim.withColumnRenamed("dk", "v"), "v")])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_running_total_decimal_exact(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01", 0.1)] * 10, "k string, d string, v double"
    ).withColumn("rn", F.monotonically_increasing_id())
    out = WN.running_total(df, ["k"], ["rn"], "v").orderBy("rn").collect()
    # decimal prefix-sum: exactly 1.0 after ten 0.1s, no float drift
    assert out[-1].running_total == 1.0


def test_setops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], "v int")
    b = spark.createDataFrame([(2,)], "v int")
    assert sorted(r.v for r in SO.table_diff(a, b).collect()) == [1, 2]
    assert [r.v for r in SO.table_common(a, b).collect()] == [2]
    assert SO.union_batches(a, b).count() == 4


def test_monthly_spend_shape(spark, sf_dir):
    from monzo_data_pipeline_spark.catalog import load_table

    out = AGG.monthly_spend(load_table(spark, sf_dir, "orders"))
    rows = out.collect()
    assert len(rows) > 0
    assert rows[0].__fields__ == ["year", "month", "total_spend", "avg_spend", "n_orders"]
    # months sorted, totals positive
    assert all(r.total_spend > 0 for r in rows)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from monzo_data_pipeline_spark.catalog import load_table
    from monzo_data_pipeline_spark.operators.skew import salted_sum_count

    o = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderstatus: (r.total, r.cnt)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    salted = {
        r.o_orderstatus: (r.total, r.cnt)
        for r in salted_sum_count(o, ["o_orderstatus"], "o_totalprice").collect()
    }
    assert salted == plain  # decimal accumulation → exact across phases


def test_sources_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    from monzo_data_pipeline_spark.catalog import load_table
    from monzo_data_pipeline_spark.sources import io as SIO

    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    SIO.write_table(
        o, path, partition_by=["order_year"], sort_within_by=["o_orderkey"], target_files=4
    )
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    # partition pruning: filtering on the partition column must prune
    pruned = back.filter(F.col("order_year") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert pruned.count() == o.filter(F.col("order_year") == 1996).count()

    # csv + json round-trips with declared schemas
    csv_path, json_path = str(tmp_path / "c.csv"), str(tmp_path / "j.json")
    small = o.limit(100).select("o_orderkey", "o_orderstatus", "o_totalprice")
    small.write.option("header", True).csv(csv_path)
    small.write.json(json_path)
    sch = "o_orderkey long, o_orderstatus string, o_totalprice double"
    from pyspark.sql.types import _parse_datatype_string

    assert SIO.read_csv(spark, csv_path, _parse_datatype_string(sch)).count() == 100
    assert SIO.read_json_lines(spark, json_path, _parse_datatype_string(sch)).count() == 100


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TX.token_count("text").alias("n_tok"),
            TX.stopword_ratio("text").alias("sw"),
            TX.lang_id_heuristic("text").alias("lang"),
        ).collect()
    }
    assert out[1].n_tok == 6
    assert out[1].sw > 0.3 and out[1].lang == "en"
    assert out[2].lang == "other_latin"


def test_rolling_range_sum_matches_bruteforce(spark):
    # 7-second lookback over hand-placed timestamps, including a tie:
    # rows at t=10 (two rows, peers) and t=15 (16-10=5s apart, inside),
    # t=20 (outside the 7s window from t=10 rows, inside from t=15).
    rows = [
        ("u1", "1970-01-01 00:00:10", 1.0),
        ("u1", "1970-01-01 00:00:10", 2.0),  # peer of the first row
        ("u1", "1970-01-01 00:00:15", 4.0),
        ("u1", "1970-01-01 00:00:20", 8.0),
        ("u2", "1970-01-01 00:00:10", 16.0),
    ]
    df = spark.createDataFrame(rows, "uid string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = WN.rolling_range_sum(df, ["uid"], "ts", "v", 7, out_col="rs")
    got = {(r.uid, r.ts.second, r.v): r.rs for r in out.collect()}
    # RANGE frame: peers at the same ts see each other regardless of row order
    assert got[("u1", 10, 1.0)] == 3.0
    assert got[("u1", 10, 2.0)] == 3.0
    assert got[("u1", 15, 4.0)] == 7.0   # 10,10,15 all within [8,15]
    assert got[("u1", 20, 8.0)] == 12.0  # window [13,20] → 15,20
    assert got[("u2", 10, 16.0)] == 16.0


def test_algebraic_moments_matches_builtin(spark, sf_dir):
    from monzo_data_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ours = {r.l_returnflag: r for r in AGG.algebraic_moments(li).collect()}
    ref = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.stddev("l_quantity").alias("sd"),
            F.corr("l_quantity", "l_extendedprice").alias("co"),
        )
        .collect()
    }
    for flag, r in ours.items():
        assert abs(r.stddev_qty - ref[flag].sd) < 1e-3
        assert abs(r.corr_qty_price - ref[flag].co) < 1e-4


def test_deterministic_mode_tiebreak(spark):
    # 'a' and 'b' both occur twice for g1 → tiebreak picks 'a' (value ASC)
    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z")],
        "g string, v string",
    )
    out = {r.g: (r.mode_value, r.n_occurrences) for r in
           AGG.deterministic_mode(df, "g", "v").collect()}
    assert out == {"g1": ("a", 2), "g2": ("z", 1)}


def test_rank_distribution_tie_stable(spark):
    # two peers share v=5 → identical pct_rank/cume_dist for both
    df = spark.createDataFrame(
        [("g", 1), ("g", 5), ("g", 5), ("g", 9)], "g string, v int"
    )
    rows = WN.rank_distribution(df, ["g"], "v").collect()
    fives = {(r.pct_rank_micro, r.cume_dist_micro) for r in rows if r.v == 5}
    assert len(fives) == 1  # peers got the same distribution values
    assert max(r.cume_dist_micro for r in rows) == 1_000_000


def test_interval_bucket_join_matches_naive_range_join(spark, sf_dir):
    """The bucketed-equi rewrite must produce exactly the rows of the
    naive non-equi join, including points in OVERLAPPING intervals
    (matched twice) and points in no interval (dropped)."""
    from monzo_data_pipeline_spark.catalog import load_table

    intervals = spark.createDataFrame(
        [("a", 1000.0, 60000.0), ("b", 47500.0, 151300.0), ("c", 250000.0, 499000.0)],
        "band string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    got = JN.interval_bucket_join(
        orders, "o_totalprice", intervals, "lo", "hi", bucket_width=20000.0
    ).select("o_orderkey", "band")
    naive = orders.join(
        intervals,
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    ).select("o_orderkey", "band")

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # overlap sanity: some order keys match two bands (a∩b nonempty)
    dup = got.groupBy("o_orderkey").count().filter(F.col("count") > 1)
    assert dup.count() > 0
    # plan contract: the rewrite must be a hash join, not nested-loop
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_resample_gap_fill_semantics(spark):
    """Inline fixture: observations at hours 0,1,4 (gap at 2,3) and a
    leading-edge key. Checks densification, forward fill, and exact
    linear interpolation values."""
    from monzo_data_pipeline_spark.operators import timeseries as TS

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:10:00", 10.0),
            ("k", "2024-01-01 01:20:00", 20.0),
            ("k", "2024-01-01 04:30:00", 50.0),
            ("k", "2024-01-01 04:40:00", 70.0),  # same bucket → avg 60
        ],
        "key string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    out = {
        r["h"].hour: r
        for r in TS.resample_gap_fill(df, ["key"], "ts", "value").collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4]          # densified to 5 buckets
    assert out[2]["v"] is None and out[3]["v"] is None
    assert out[2]["ffill_v"] == 20.0 and out[3]["ffill_v"] == 20.0
    # lerp between (h1, 20) and (h4, 60): h2 → 20+40/3, h3 → 20+80/3
    assert abs(out[2]["lerp_v"] - (20.0 + 40.0 / 3.0)) < 1e-9
    assert abs(out[3]["lerp_v"] - (20.0 + 80.0 / 3.0)) < 1e-9
    assert out[4]["v"] == 60.0 and out[4]["lerp_v"] == 60.0


def test_grid_radius_join_matches_naive(spark):
    """Grid rewrite must equal the naive all-pairs distance join,
    including pairs straddling cell boundaries, and must not plan a
    nested-loop join."""
    from monzo_data_pipeline_spark.operators import geo as GEO

    a = spark.createDataFrame(
        [(i, (i * 37 % 100) / 7.0, (i * 53 % 100) / 7.0) for i in range(200)],
        "aid long, ax double, ay double",
    )
    b = spark.createDataFrame(
        [(j, (j * 41 % 100) / 7.0, (j * 29 % 100) / 7.0) for j in range(80)],
        "bid long, bx double, by double",
    )
    r = 1.3
    got = GEO.grid_radius_join(a, "ax", "ay", b, "bx", "by", radius=r)
    naive = a.crossJoin(b).filter(
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        <= r * r
    )
    assert sorted(
        (row["aid"], row["bid"]) for row in got.select("aid", "bid").collect()
    ) == sorted((row["aid"], row["bid"]) for row in naive.select("aid", "bid").collect())
    assert naive.count() > 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_session_window_boundary_merges_on_exact_gap(spark):
    """Spark session_window spans [ts, ts+gap) but MERGES a successor
    landing exactly on the boundary; a gap must strictly exceed the
    threshold to split. The sessionization oracle encodes `>`, and this
    pins the engine side of that contract."""
    import datetime as dt

    from monzo_data_pipeline_spark.streaming.windows import sessionized_counts

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1),
        (1, t0 + dt.timedelta(seconds=900), 2),          # exact gap: merges
        (1, t0 + dt.timedelta(seconds=900 * 2 + 1), 3),  # gap + 1s: splits
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    got = sessionized_counts(df, gap="15 minutes").orderBy("session_start").collect()
    assert [r["n_events"] for r in got] == [2, 1]
    # merged session covers [t0, last_ts + gap)
    assert got[0]["session_start"] == t0
    assert got[0]["session_end"] == t0 + dt.timedelta(seconds=1800)


def test_upsert_merge_update_insert_last_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", None), (2, "b", None)],
        "id long, val string, settled string",
    )
    # two versions for id=1 (v2 must win), one late settle for id=2,
    # one brand-new id=3
    updates = spark.createDataFrame(
        [
            (1, "a-v1", None, 1),
            (1, "a-v2", None, 2),
            (2, "b", "2025-01-01", 1),
            (3, "c", None, 1),
        ],
        "id long, val string, settled string, v long",
    )
    got = {
        r["id"]: (r["val"], r["settled"])
        for r in DD.upsert_merge(target, updates, ["id"], order_cols=["v"]).collect()
    }
    assert got == {
        1: ("a-v2", None),
        2: ("b", "2025-01-01"),
        3: ("c", None),
    }
    # idempotence: re-applying the same batch changes nothing
    merged = DD.upsert_merge(target, updates, ["id"], order_cols=["v"])
    again = DD.upsert_merge(merged, updates, ["id"], order_cols=["v"])
    assert sorted(again.collect()) == sorted(merged.collect())


def test_snapshot_diff_classifies_all_null_rows_correctly(spark):
    from monzo_data_pipeline_spark.operators import setops as SO2

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "x2"), (4, None)], "id long, v string"
    )
    got = {
        r["id"]: r["change_type"]
        for r in SO2.snapshot_diff(old, new, keys=["id"]).collect()
    }
    # id=1: present both sides with NULL value → unchanged (absent);
    # id=4 added with NULL value — nullability can't prove absence
    assert got == {2: "updated", 3: "removed", 4: "added"}


def test_mad_outliers_flags_far_point(spark):
    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14]] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = AGG.mad_outliers(df, ["k"], "v").collect()[0]
    # median of {10..14,1000}=12.5, MAD=1.5 -> only 1000 exceeds 3*MAD
    assert out.n == 6 and out.n_outliers == 1
    assert out.med_r == 12.5 and out.mad_r == 1.5


def test_equi_depth_histogram_balanced(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    )
    rows = AGG.equi_depth_histogram(df, "v", n_buckets=4).collect()
    assert [r.bucket for r in rows] == [0, 1, 2, 3]
    assert [r.n for r in rows] == [25, 25, 25, 25]
    assert rows[0].lo == 1.0 and rows[-1].hi == 100.0


def test_asof_join_direction_and_tolerance(spark):
    """r8: merge_asof parity — forward direction and the tolerance
    window, constructed so every lane is exercised: equal-ts match,
    out-of-tolerance NULL, no-candidate NULL."""
    import datetime as dt

    from monzo_data_pipeline_spark.operators import joins as JN

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(0), "a"), (1, ts(100), "b"), (2, ts(0), "c")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(30), 20.0), (1, ts(300), 30.0)],
        "k int, ts timestamp, v double",
    )

    fwd = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"], direction="forward"
        ).collect()
    }
    # equal ts matches forward; t=100 → next is t=300; k=2 → none
    assert fwd == {"a": 10.0, "b": 30.0, "c": None}

    fwd_tol = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"],
            direction="forward", tolerance=F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    # t=100's next match (t=300) is 200 min away → NULLed by tolerance
    assert fwd_tol == {"a": 10.0, "b": None, "c": None}

    back_tol = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"],
            direction="backward", tolerance=F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    # t=100 looks back to t=30 (70 min > 60) → NULL; t=0 matches t=0
    assert back_tol == {"a": 10.0, "b": None, "c": None}

    back = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"]
        ).collect()
    }
    assert back == {"a": 10.0, "b": 20.0, "c": None}


def test_asof_join_nearest(spark):
    """r8: direction='nearest' — smaller time distance wins, ties go
    backward, tolerance prunes each side before the choice."""
    import datetime as dt

    from monzo_data_pipeline_spark.operators import joins as JN

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [
            (1, ts(10), "near_back"),   # back@0 (10 away) vs fwd@100 (90)
            (1, ts(95), "near_fwd"),    # back@0 (95) vs fwd@100 (5)
            (1, ts(50), "tie"),         # back@0 (50) vs fwd@100 (50) → back
            (2, ts(0), "none"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(100), 2.0)],
        "k int, ts timestamp, v double",
    )
    near = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"], direction="nearest"
        ).collect()
    }
    assert near == {
        "near_back": 1.0, "near_fwd": 2.0, "tie": 1.0, "none": None,
    }
    near_tol = {
        r.tag: r.v
        for r in JN.asof_join(
            left, right, "ts", ["k"], ["v"],
            direction="nearest",
            tolerance=F.expr("INTERVAL 30 MINUTES"),
        ).collect()
    }
    # tie row: both candidates 50 min away > 30 → NULL; near_back's
    # backward match is 10 min (ok); near_fwd's forward is 5 min (ok)
    assert near_tol == {
        "near_back": 1.0, "near_fwd": 2.0, "tie": None, "none": None,
    }
