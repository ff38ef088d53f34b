"""Event-sequence analytics: Markov transitions, session paths,
period-over-period movers — hermetic inline fixtures."""

from __future__ import annotations

from datetime import datetime

from monzo_data_pipeline_spark.operators import behavioral as BH
from monzo_data_pipeline_spark.operators import windows as WN

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, s), u, t) for i, (s, u, t) in enumerate(rows)],
        SCHEMA,
    )


def test_transition_counts_and_probabilities(spark):
    # user 1: a->b->a ; user 2: a->b  =>  a->b:2, b->a:1
    df = _ev(spark, [(0, 1, "a"), (1, 1, "b"), (2, 1, "a"), (0, 2, "a"), (1, 2, "b")])
    out = {(r.from_type, r.to_type): r for r in BH.transition_counts(df).collect()}
    assert out[("a", "b")].n == 2 and out[("b", "a")].n == 1
    # from 'a' the only observed successor is 'b' => prob_q = 1_000_000
    assert out[("a", "b")].prob_q == 1_000_000
    assert out[("b", "a")].prob_q == 1_000_000


def test_transition_ties_break_on_event_id(spark):
    # two events at the SAME timestamp: order must follow event_id
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 1, "x"),
            (2, datetime(2024, 1, 1), 1, "y"),
        ],
        SCHEMA,
    )
    out = BH.transition_counts(df).collect()
    assert len(out) == 1 and (out[0].from_type, out[0].to_type) == ("x", "y")


def test_session_paths_gap_split(spark):
    # user 1: two events 10 min apart (one session), then one 20 min
    # later (new session); user 2 mirrors the first path
    def at(minute, u, t, i):
        return (i, datetime(2024, 1, 1, 0, minute), u, t)

    df = spark.createDataFrame(
        [
            at(0, 1, "view", 0),
            at(10, 1, "click", 1),
            at(31, 1, "view", 2),
            at(0, 2, "view", 3),
            at(10, 2, "click", 4),
        ],
        SCHEMA,
    )
    rows = BH.session_paths(df, gap_minutes=15).collect()
    by_path = {r.path: r.n_sessions for r in rows}
    assert by_path == {"view>click": 2, "view": 1}


def test_period_over_period_change(spark):
    df = spark.createDataFrame(
        [("g", 1, 100.0), ("g", 2, 150.0), ("g", 3, 75.0), ("h", 1, 10.0)],
        "grp string, period int, revenue double",
    )
    out = {
        r.period: r
        for r in WN.period_over_period(df, "grp", "period", "revenue").collect()
    }
    # h has a single period -> no row; g period 1 has no prev -> no row
    assert set(out) == {2, 3}
    assert out[2].change_q == 500_000  # +50%
    assert out[3].change_q == -500_000  # -50%


def test_compress_changes_keeps_only_change_points(spark):
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1), 7, 10.0),
        (2, dt(2024, 1, 2), 7, 10.0),  # no-op snapshot -> dropped
        (3, dt(2024, 1, 3), 7, None),  # 10 -> NULL is a change
        (4, dt(2024, 1, 4), 7, None),  # NULL -> NULL unchanged -> dropped
        (5, dt(2024, 1, 5), 7, 12.0),
        (6, dt(2024, 1, 1), 8, None),  # first row kept even when NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    from monzo_data_pipeline_spark.operators.behavioral import compress_changes

    kept = sorted(r.event_id for r in compress_changes(df).collect())
    assert kept == [1, 3, 5, 6]
