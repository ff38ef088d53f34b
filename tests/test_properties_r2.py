"""Property-based tests for the round-2 operators: every one is
checked against a brute-force Python reference over randomized inputs
(the hypothesis strategy of tests/test_properties.py), because their
correctness claims are algebraic — a fold law (fingerprints), the
winnowing selection rule, a weighted mean, islands-of-months — not a
fixture."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from monzo_data_pipeline_spark.functions import text as TX
from monzo_data_pipeline_spark.operators import fin as FIN

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

M, B = 2_147_483_647, 131


@pytest.fixture(scope="module")
def sp(spark):
    return spark


# -- python references -------------------------------------------------------


def _py_clean(text: str) -> str:
    clean = "".join(c for c in text if 0x20 <= ord(c) <= 0x7E)
    return clean or " "


def _py_poly(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * B + ord(c)) % M
    return acc


def _py_winnow(text: str):
    toks = text.lower().split()
    if len(toks) < 3:
        return None
    th = [_py_poly(t) for t in toks]
    g = [
        (((th[j] * B + th[j + 1]) % M) * B + th[j + 2]) % M
        for j in range(len(th) - 2)
    ]
    n_windows = max(len(g) - 3, 1)
    mins = [min(g[i : i + 4]) for i in range(n_windows)]
    fps = sorted(set(mins))
    return len(fps), fps[0], sum(fps)


# -- fingerprints ------------------------------------------------------------

TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x2FF),
    max_size=60,
)


@given(texts=st.lists(TEXT, min_size=1, max_size=12))
@SET
def test_polynomial_fingerprint_matches_python_fold(sp, texts):
    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", TX.polynomial_fingerprint("text").alias("fp")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_poly(_py_clean(t)), repr(t)


WORD = st.text(alphabet="abcxyz0", min_size=1, max_size=5)


@given(docs=st.lists(st.lists(WORD, min_size=3, max_size=25), min_size=1, max_size=6))
@SET
def test_winnowing_matches_python_reference(sp, docs):
    texts = [" ".join(ws) for ws in docs]
    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_min"], r["fp_sum"])
        for r in TX.winnowing_fingerprints(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), repr(t)


# -- time-weighted balance ---------------------------------------------------

EV = st.tuples(
    st.integers(0, 3),  # user
    st.integers(0, 500_000),  # offset seconds (may collide → tiebreak path)
    st.floats(0.0, 400.0, allow_nan=False, width=32),
)


@given(rows=st.lists(EV, min_size=2, max_size=40, unique_by=lambda r: (r[0], r[1])))
@SET
def test_time_weighted_balance_matches_bruteforce(sp, rows):
    base = datetime(2024, 1, 1)
    data = [
        (i, u, "view", float(v), base + timedelta(seconds=off))
        for i, (u, off, v) in enumerate(rows)
    ]
    df = sp.createDataFrame(
        data, "event_id long, user_id long, event_type string, value double, ts timestamp"
    )
    got = {
        r["user_id"]: (r["twa_value_q"], r["n_intervals"])
        for r in FIN.time_weighted_balance(df).collect()
    }
    by_user: dict[int, list] = {}
    for i, (u, off, v) in enumerate(rows):
        by_user.setdefault(u, []).append((off, i, v))
    for u, evs in by_user.items():
        evs.sort()
        wsum = tsum = 0
        for (off, _, v), (noff, _, _) in zip(evs, evs[1:]):
            vq, dur = int(np.floor(float(np.float64(v)) * 1000)), noff - off
            wsum, tsum = wsum + vq * dur, tsum + dur
        if tsum > 0:
            assert got[u] == (wsum // tsum, len(evs) - 1)
        else:
            assert u not in got


# -- subscription streaks ----------------------------------------------------

OM = st.tuples(st.integers(0, 3), st.integers(0, 30))  # (cust, month index)


@given(pairs=st.lists(OM, min_size=1, max_size=40))
@SET
def test_subscription_streaks_match_bruteforce(sp, pairs):
    base_y, base_m = 2020, 1
    data = [
        (i, c, 10.0, datetime(base_y + (base_m - 1 + mi) // 12, (base_m - 1 + mi) % 12 + 1, 5))
        for i, (c, mi) in enumerate(pairs)
    ]
    df = sp.createDataFrame(
        data, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = sorted(
        (r["o_custkey"], r["streak_months"], r["first_month"], r["last_month"])
        for r in FIN.subscription_streaks(df).collect()
    )
    want = []
    by_cust: dict[int, set] = {}
    for c, mi in pairs:
        # Spark emits year·12+month = (2020 + mi//12)·12 + (mi%12 + 1)
        by_cust.setdefault(c, set()).add(2020 * 12 + mi + 1)
    for c, months in by_cust.items():
        run: list[int] = []
        for mi in sorted(months) + [10**9]:
            if run and mi != run[-1] + 1:
                if len(run) >= 3:
                    want.append((c, len(run), run[0], run[-1]))
                run = []
            run.append(mi)
    assert got == sorted(want)


# -- image codec properties (no Spark: pure numpy round trips) ---------------

DIM = st.integers(1, 24)


@given(h=DIM, w=DIM, seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_ppm_roundtrip_any_dims(h, w, seed):
    from monzo_data_pipeline_spark.ext import images as IMG

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(IMG.decode_netpbm(IMG.encode_ppm(arr)), arr)


@given(h=DIM, w=DIM, th=DIM, tw=DIM, seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_resize_index_law_any_dims(h, w, th, tw, seed):
    from monzo_data_pipeline_spark.ext import images as IMG

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = IMG.resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    for y in range(th):
        for x in range(tw):
            assert np.array_equal(out[y, x], arr[(y * h) // th, (x * w) // tw])


# -- BPE: random corpora vs textbook reference -------------------------------

BPE_WORD = st.text(alphabet="abc", min_size=1, max_size=4)


@given(
    docs=st.lists(
        st.lists(BPE_WORD, min_size=1, max_size=8), min_size=1, max_size=4
    ),
    n_merges=st.integers(1, 4),
)
@SET
def test_bpe_merges_match_textbook_on_random_corpora(sp, docs, n_merges):
    from monzo_data_pipeline_spark.ext import bpe as BPE
    from tests.test_bpe_projection import _py_bpe

    texts = [" ".join(ws) for ws in docs]
    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    want = _py_bpe(words, n_merges)
    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in BPE.bpe_merges(df, n_merges=n_merges).orderBy("step").collect()
    ]
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    nb=st.integers(min_value=2, max_value=7),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_ntile_property_matches_window_ntile(sp, vals, nb):
    """Property: exact_ntile == ntile() OVER a global order for random
    multisets (ties everywhere) and any bucket count."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from monzo_data_pipeline_spark.operators.windows import exact_ntile

    df = sp.createDataFrame(
        [(float(v), i) for i, v in enumerate(vals)], "v double, id bigint"
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    plain = {
        (r.id, r.nt) for r in df.withColumn("nt", F.ntile(nb).over(w)).collect()
    }
    got = {
        (r.id, r.nt)
        for r in exact_ntile(df, nb, "v", "id", range_buckets=4).collect()
    }
    assert got == plain
