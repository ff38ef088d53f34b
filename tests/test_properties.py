"""Property-based tests (hypothesis) for the custom operator
compositions — the ones whose correctness is an algebraic claim over
ALL inputs, not a fixture: first-wins dedup, as-of join, salted
aggregation. Randomized inputs are checked against brute-force Python
reference implementations.

Spark-job-per-example is slow, so max_examples stays small and each
example uses a single createDataFrame + collect round trip.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pytest

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROW = st.tuples(
    st.integers(0, 5),          # key
    st.integers(0, 10),         # order stamp (duplicates allowed)
    st.integers(0, 4),          # tiebreak id
    st.integers(-100, 100),     # payload
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(rows=st.lists(ROW, min_size=1, max_size=40))
@SET
def test_first_wins_dedup_matches_bruteforce(sp, rows):
    from monzo_data_pipeline_spark.operators.dedup import first_wins_dedup

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("stamp", T.IntegerType()),
            T.StructField("tid", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    df = sp.createDataFrame(rows, schema)
    got = sorted(
        map(tuple, first_wins_dedup(df, ["k"], ["stamp", "tid", "v"]).collect())
    )
    # brute force: per key, min by (stamp, tid, v) — the total order
    best: dict[int, tuple] = {}
    for k, stamp, tid, v in rows:
        cand = (stamp, tid, v)
        if k not in best or cand < best[k]:
            best[k] = cand
    want = sorted((k, *t) for k, t in best.items())
    assert got == want


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-99, 99)),
        min_size=0,
        max_size=25,
    ),
)
@SET
def test_asof_join_matches_bruteforce(sp, left, right):
    from monzo_data_pipeline_spark.operators.joins import asof_join

    # dedup right on (key, ts): an as-of match at equal ts must be
    # unique to be well-defined; keep the max payload as the winner
    rbest: dict[tuple, int] = {}
    for k, ts, v in right:
        key = (k, ts)
        if key not in rbest or v > rbest[key]:
            rbest[key] = v
    right = [(k, ts, v) for (k, ts), v in rbest.items()]

    lschema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("ts", T.IntegerType()),
        ]
    )
    rschema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("ts", T.IntegerType()),
            T.StructField("val", T.IntegerType()),
        ]
    )
    ldf = sp.createDataFrame(left, lschema)
    rdf = sp.createDataFrame(right, rschema) if right else sp.createDataFrame(
        [], rschema
    )
    got = sorted(
        map(
            tuple,
            asof_join(ldf, rdf, "ts", by=["k"], right_vals=["val"])
            .select("k", "ts", "val")
            .collect(),
        ),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    want = []
    for k, lts in left:
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= lts]
        v = max(cands)[1] if cands else None
        want.append((k, lts, v))
    want.sort(key=lambda t: tuple((x is None, x) for x in t))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    buckets=st.sampled_from([1, 3, 16]),
)
@SET
def test_salted_sum_matches_plain(sp, rows, buckets):
    from monzo_data_pipeline_spark.operators.skew import salted_sum_count

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    df = sp.createDataFrame(rows, schema)
    got = {
        r["k"]: (r["total"], r["cnt"])
        for r in salted_sum_count(df, ["k"], "v", salt_buckets=buckets).collect()
    }
    want: dict[int, list] = {}
    for k, v in rows:
        agg = want.setdefault(k, [0, 0])
        agg[0] += v
        agg[1] += 1
    assert got == {k: (float(s), c) for k, (s, c) in want.items()}


POINT = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False)
IVAL = st.tuples(POINT, st.floats(min_value=0.0, max_value=30.0, allow_nan=False))


@given(
    points=st.lists(POINT, min_size=1, max_size=30),
    intervals=st.lists(IVAL, min_size=1, max_size=10),
    width=st.sampled_from([0.7, 3.0, 11.0]),
)
@SET
def test_interval_bucket_join_matches_bruteforce(sp, points, intervals, width):
    """Grid rewrite == brute-force lo <= v < hi for arbitrary signed,
    overlapping, zero-width intervals and any bucket width."""
    from monzo_data_pipeline_spark.operators.joins import interval_bucket_join

    pts = sp.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "pid int, v double"
    )
    ivs = sp.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(intervals)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bucket_join(pts, "v", ivs, "lo", "hi", width)
        .select("pid", "iid")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(points)
        for j, (lo, w) in enumerate(intervals)
        if lo <= v < lo + w
    )
    assert got == want


@given(
    pa=st.lists(st.tuples(POINT, POINT), min_size=1, max_size=20),
    pb=st.lists(st.tuples(POINT, POINT), min_size=1, max_size=12),
    radius=st.sampled_from([0.9, 4.0, 15.0]),
)
@SET
def test_grid_radius_join_matches_bruteforce(sp, pa, pb, radius):
    from monzo_data_pipeline_spark.operators.geo import grid_radius_join

    a = sp.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pa)], "aid int, ax double, ay double"
    )
    b = sp.createDataFrame(
        [(j, x, y) for j, (x, y) in enumerate(pb)], "bid int, bx double, by double"
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in grid_radius_join(a, "ax", "ay", b, "bx", "by", radius)
        .select("aid", "bid")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, (x1, y1) in enumerate(pa)
        for j, (x2, y2) in enumerate(pb)
        if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= radius * radius
    )
    assert got == want


# ---------------------------------------------------------------------------
# Partition-invariance + conservation properties for the sequence/search ops:
# results must not depend on how the input is partitioned, and integer
# conservation laws must hold on random inputs.
# ---------------------------------------------------------------------------


def _random_events(spark, seed, n_users=7, n_events=120):
    import random

    rng = random.Random(seed)
    rows = [
        (
            i,
            datetime(2024, 1, 1, 0, 0, 0)
            + timedelta(seconds=rng.randrange(0, 3600 * 50)),
            rng.randrange(n_users),
            rng.choice(["a", "b", "c", "d"]),
        )
        for i in range(n_events)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_transition_counts_conservation_and_partition_invariance(spark):
    from monzo_data_pipeline_spark.operators.behavioral import transition_counts

    ev = _random_events(spark, seed=13)
    out1 = {(r.from_type, r.to_type): r.n for r in transition_counts(ev).collect()}
    out7 = {
        (r.from_type, r.to_type): r.n
        for r in transition_counts(ev.repartition(7)).collect()
    }
    assert out1 == out7
    # each user with k events contributes exactly k-1 transitions
    n_users = ev.select("user_id").distinct().count()
    assert sum(out1.values()) == ev.count() - n_users


def test_session_paths_partition_invariance(spark):
    from monzo_data_pipeline_spark.operators.behavioral import session_paths

    ev = _random_events(spark, seed=29)
    a = [tuple(r) for r in session_paths(ev, gap_minutes=30).collect()]
    b = [tuple(r) for r in session_paths(ev.repartition(5), gap_minutes=30).collect()]
    assert a == b and len(a) > 0


def test_bm25_partition_invariance(spark):
    from monzo_data_pipeline_spark.ext.search import bm25_scores

    import random

    rng = random.Random(47)
    vocab = ["spark", "hash", "merge", "x", "y", "z", "w"]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))))
            for i in range(60)
        ],
        "doc_id bigint, text string",
    )
    a = [tuple(r) for r in bm25_scores(docs).collect()]
    b = [tuple(r) for r in bm25_scores(docs.repartition(9)).collect()]
    assert a == b and len(a) > 0


def test_curriculum_sample_is_subset_and_partition_invariant(spark):
    from monzo_data_pipeline_spark.functions.text import curriculum_sample

    import random

    rng = random.Random(3)
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    rng.choice(["the", "fox", "!!!", "runs", "###", "hill"])
                    for _ in range(rng.randrange(2, 60))
                ),
            )
            for i in range(200)
        ],
        "doc_id bigint, text string",
    )
    kept = sorted(r.doc_id for r in curriculum_sample(docs).collect())
    kept_re = sorted(
        r.doc_id for r in curriculum_sample(docs.repartition(11)).collect()
    )
    assert kept == kept_re
    assert set(kept) <= set(range(200)) and 0 < len(kept) < 200


NAME = st.text(alphabet="abc", min_size=0, max_size=18)


@given(names=st.lists(NAME, min_size=1, max_size=12, unique=True))
@SET
def test_edit_distance_pairs_complete_vs_bruteforce(sp, names):
    """Ed-Join blocking must be COMPLETE for every input shape — the
    prefix-filter theorem plus the short-string block, checked against
    brute-force levenshtein over a tiny alphabet (worst case for gram
    collisions AND for short-string edge cases)."""
    import itertools

    from monzo_data_pipeline_spark.ext.dedup_fuzzy import edit_distance_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    df = sp.createDataFrame([(n,) for n in names], "nm string")
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in edit_distance_pairs(df, "nm", max_dist=3).collect()
    }
    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if lev(a, b) <= 3
    }
    assert got == want
