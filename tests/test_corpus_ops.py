"""Behavioral tests for the round-4 web-corpus curation operators
(ext/corpus.py): CCNet-style segment dedup, hashed linear quality
classifier, deterministic splits, phrase search, KS drift, repeat
collapse. Each test pins semantics against a hand-computed or pure-
Python reference on planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.ext import corpus as CP

POLY_MOD = 2_147_483_647
POLY_BASE = 131


def _py_char_fold(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * POLY_BASE + ord(ch)) % POLY_MOD
    return acc


def _py_fold(hashes) -> int:
    acc = 0
    for h in hashes:
        acc = (acc * POLY_BASE + h) % POLY_MOD
    return acc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# segment_dedup


def test_segment_dedup_drops_shared_passage_everywhere(spark):
    boiler = "the same eight token boilerplate footer appears here"  # 8 toks
    uniq_a = "alpha beta gamma delta epsilon zeta eta theta"
    uniq_b = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (1, f"{uniq_a} {boiler}"),
            (2, f"{uniq_b} {boiler}"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in CP.segment_dedup(docs, seg_len=8, max_count=1).collect()
    }
    # each doc: 2 segments, the boilerplate one dropped from BOTH
    for d in (1, 2):
        assert out[d]["n_segs"] == 2
        assert out[d]["n_kept"] == 1
    assert out[1]["kept_fold"] == _py_fold([_py_char_fold(uniq_a)])
    assert out[2]["kept_fold"] == _py_fold([_py_char_fold(uniq_b)])


def test_segment_dedup_unique_doc_keeps_everything_in_order(spark):
    words = [f"w{i}" for i in range(20)]  # 20 tokens → segs of 8, 8, 4
    docs = _docs(spark, [(7, " ".join(words))])
    row = CP.segment_dedup(docs, seg_len=8, max_count=1).collect()[0]
    segs = [
        " ".join(words[0:8]),
        " ".join(words[8:16]),
        " ".join(words[16:20]),
    ]
    assert row["n_segs"] == 3
    assert row["n_kept"] == 3
    assert row["kept_fold"] == _py_fold([_py_char_fold(s) for s in segs])


def test_segment_dedup_all_dropped_folds_to_zero(spark):
    same = "identical doc repeated verbatim across the corpus yes"
    docs = _docs(spark, [(1, same), (2, same), (3, same)])
    rows = CP.segment_dedup(docs, seg_len=8, max_count=1).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_kept"] == 0
        assert r["kept_fold"] == 0


def test_segment_dedup_max_count_threshold(spark):
    same = "identical doc repeated verbatim across the corpus yes"
    docs = _docs(spark, [(1, same), (2, same)])
    rows = CP.segment_dedup(docs, seg_len=8, max_count=2).collect()
    for r in rows:  # count == 2 ≤ max_count → kept
        assert r["n_kept"] == 1


# ---------------------------------------------------------------------------
# hashed_quality_scores


def test_hashed_quality_scores_match_python_reference(spark):
    text = "spark catalyst tungsten arrow shuffle broadcast"
    docs = _docs(spark, [(1, text)])
    row = CP.hashed_quality_scores(docs, n_buckets=4096).collect()[0]

    def w(tok: str) -> int:
        h = _py_char_fold(tok)
        return ((h % 4096) * 1_103_515_245 + 12_345) % 2001 - 1000

    toks = text.split()
    assert row["n_tokens"] == len(toks)
    assert row["score"] == sum(w(t) for t in toks)
    assert row["accept"] == (row["score"] >= 0)


def test_hashed_quality_scores_empty_text_excluded(spark):
    docs = _docs(spark, [(1, "   "), (2, "ok fine")])
    rows = CP.hashed_quality_scores(docs).collect()
    assert [r["doc_id"] for r in rows] == [2]


# ---------------------------------------------------------------------------
# split_assignment / split_audit


def test_split_assignment_deterministic_and_total(spark):
    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = CP.split_assignment(docs).groupBy("split").count().collect()
    shares = {r["split"]: r["count"] for r in a}
    assert set(shares) == {"train", "val", "test"}
    assert sum(shares.values()) == 5000
    # multiplicative hash keeps shares near 80/10/10
    assert abs(shares["train"] - 4000) < 300
    assert abs(shares["val"] - 500) < 150
    assert abs(shares["test"] - 500) < 150
    # repartitioning does not move any doc between splits
    b = (
        CP.split_assignment(docs.repartition(13))
        .groupBy("split")
        .count()
        .collect()
    )
    assert {r["split"]: r["count"] for r in b} == shares


def test_split_audit_share_ppm_sums_to_million(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", f"src{i % 3}") for i in range(300)],
        "doc_id long, lang string, source string",
    )
    rows = CP.split_audit(docs).collect()
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault((r["lang"], r["source"]), []).append(r)
    for rs in by_stratum.values():
        tot = sum(r["n_docs"] for r in rs)
        # ppm shares from integer DIV undershoot by < 1 ppm per split
        ppm = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= ppm <= 1_000_000
        assert all(
            r["share_ppm"] == r["n_docs"] * 1_000_000 // tot for r in rs
        )


# ---------------------------------------------------------------------------
# phrase_match


def test_phrase_match_counts_and_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "full table scan then table scan again"),  # 2 matches
            (2, "table of contents no scan phrase"),  # words apart → 0
            (3, "scan table reversed order"),  # reversed → 0
            (4, "a table scan b"),  # 1 match
            (5, "table table table"),  # self-overlap probe
        ],
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in CP.phrase_match(docs, "table scan", k=10).collect()
    }
    assert out == {1: 2, 4: 1}


def test_phrase_match_overlapping_repeated_word(spark):
    docs = _docs(spark, [(1, "go go go go")])
    out = CP.phrase_match(docs, "go go", k=5).collect()
    assert out[0]["n_matches"] == 3  # positions (0,1) (1,2) (2,3)


def test_phrase_match_top_k_ordering(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["x y"] * i)) for i in range(1, 6)],
    )
    rows = CP.phrase_match(docs, "x y", k=3).collect()
    assert [r["doc_id"] for r in rows] == [5, 4, 3]
    assert [r["n_matches"] for r in rows] == [5, 4, 3]


# ---------------------------------------------------------------------------
# ks_drift


def _ks_docs(spark, vals_a, vals_b):
    rows = [(i, "src0", v) for i, v in enumerate(vals_a)] + [
        (10_000 + i, "src1", v) for i, v in enumerate(vals_b)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_ks_drift_identical_distributions_is_zero(spark):
    vals = [16 * i for i in range(1, 11)]
    row = CP.ks_drift(_ks_docs(spark, vals, vals), bin_width=16).collect()[0]
    assert row["ks_ppm"] == 0
    assert row["n1"] == 10 and row["n2"] == 10


def test_ks_drift_disjoint_distributions_is_full(spark):
    a = [0, 1, 2, 3]  # bins 0 (width 16)
    b = [160, 161, 162, 163]  # bin 10
    row = CP.ks_drift(_ks_docs(spark, a, b), bin_width=16).collect()[0]
    assert row["ks_ppm"] == 1_000_000  # CDFs fully separated
    assert row["ks_bin"] == 0  # max reached at the first bin


def test_ks_drift_hand_computed(spark):
    # src0: bins 0,0,1  src1: bins 0,1,1
    row = CP.ks_drift(
        _ks_docs(spark, [0, 1, 16], [0, 16, 17]), bin_width=16
    ).collect()[0]
    # bin 0: |2/3 - 1/3| = 333333.33…ppm → floor 333333; bin 1: 0
    assert row["ks_ppm"] == 333_333
    assert row["ks_bin"] == 0
    assert row["n_bins"] == 2


# ---------------------------------------------------------------------------
# collapse_repeats


def test_collapse_repeats_basic(spark):
    docs = _docs(spark, [(1, "a a a b b c a")])
    row = CP.collapse_repeats(docs).collect()[0]
    assert row["n_tokens"] == 7
    assert row["n_kept"] == 4  # a b c a
    assert row["kept_fold"] == _py_fold(
        [_py_char_fold(t) for t in ["a", "b", "c", "a"]]
    )


def test_collapse_repeats_no_repeats_identity(spark):
    docs = _docs(spark, [(1, "alpha beta gamma")])
    row = CP.collapse_repeats(docs).collect()[0]
    assert row["n_kept"] == 3
    assert row["kept_fold"] == _py_fold(
        [_py_char_fold(t) for t in ["alpha", "beta", "gamma"]]
    )


def test_collapse_repeats_single_token(spark):
    docs = _docs(spark, [(1, "solo")])
    row = CP.collapse_repeats(docs).collect()[0]
    assert row["n_tokens"] == 1 and row["n_kept"] == 1


# ---------------------------------------------------------------------------
# plan contracts: the map-side ops stay shuffle-free


@pytest.mark.parametrize(
    "build",
    [
        lambda df: CP.hashed_quality_scores(df),
        lambda df: CP.collapse_repeats(df),
        lambda df: CP.split_assignment(df.withColumn("n", F.lit(1))),
    ],
)
def test_mapside_ops_have_no_exchange(spark, build):
    docs = _docs(spark, [(1, "a b c"), (2, "d e f")])
    plan = build(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# weighted_priority_sample


def test_weighted_priority_sample_matches_python_reference(spark):
    from monzo_data_pipeline_spark.operators import filters as FLT

    rows = [(i, (i % 7 + 1) * 100) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "k long, w long")
    got = FLT.weighted_priority_sample(
        df, F.col("w"), key_col="k", k=10
    ).collect()

    def pri(k, w):
        return (k % 2_147_483_647) * 2_654_435_761 % 2_147_483_647 * 1_000_000 // w

    ref = sorted(((pri(k, w), k, w) for k, w in rows))[:10]
    assert [(r["priority"], r["k"], r["weight"]) for r in got] == ref


def test_weighted_priority_sample_favors_heavy_rows(spark):
    from monzo_data_pipeline_spark.operators import filters as FLT

    # 500 light rows (weight 1) vs 500 heavy rows (weight 10_000):
    # heavy rows should dominate the sample
    rows = [(i, 1) for i in range(500)] + [
        (1000 + i, 10_000) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, w long")
    got = FLT.weighted_priority_sample(df, F.col("w"), key_col="k", k=50)
    heavy = sum(1 for r in got.collect() if r["k"] >= 1000)
    assert heavy >= 45


def test_weighted_priority_sample_plan_is_take_ordered(spark):
    from monzo_data_pipeline_spark.operators import filters as FLT

    df = spark.createDataFrame([(1, 5), (2, 6)], "k long, w long")
    plan = (
        FLT.weighted_priority_sample(df, F.col("w"), key_col="k", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# source_vocab_jaccard


def test_source_vocab_jaccard_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in CP.source_vocab_jaccard(docs).collect()
    }
    # s1={a,b,c} s2={b,c,d}: inter 2, union 4 → 500000 ppm
    r = out[("s1", "s2")]
    assert (r["n_inter"], r["n_union"], r["jaccard_ppm"]) == (2, 4, 500_000)
    # s3 shares nothing → absent (inner join)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_source_vocab_jaccard_duplicate_words_counted_once(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b", "s1"), (2, "a b b b", "s2")],
        "doc_id long, text string, source string",
    )
    r = CP.source_vocab_jaccard(docs).collect()[0]
    assert (r["n_inter"], r["n_union"], r["jaccard_ppm"]) == (2, 2, 1_000_000)


# ---------------------------------------------------------------------------
# ADVICE r4 regressions: degenerate-input contracts


def test_split_assignment_negative_ids_bucket_correctly(spark):
    # % keeps the dividend's sign in both engines; split_assignment
    # must pmod so negative ids spread over all three splits instead
    # of collapsing into 'train' via a negative bucket
    docs = spark.createDataFrame(
        [(-i,) for i in range(1, 2001)], "doc_id long"
    )
    counts = {
        r["split"]: r["count"]
        for r in CP.split_assignment(docs).groupBy("split").count().collect()
    }
    assert set(counts) == {"train", "val", "test"}
    # ~80/10/10 within loose bounds
    assert 0.70 < counts["train"] / 2000 < 0.90

    def py_bucket(i):
        return (i % POLY_MOD) * 2_654_435_761 % POLY_MOD % 100

    rows = CP.split_assignment(docs).collect()
    for r in rows[:50]:
        b = py_bucket(r["doc_id"])  # python % is already pmod
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == want


def test_weighted_priority_sample_excludes_nonpositive_weights(spark):
    from monzo_data_pipeline_spark.operators import filters as FLT

    rows = [(1, 0), (2, -5), (3, 10), (4, 20), (-7, 30)]
    df = spark.createDataFrame(rows, "k long, w long")
    got = FLT.weighted_priority_sample(df, F.col("w"), key_col="k", k=10)
    res = got.collect()
    ks = {r["k"] for r in res}
    # zero/negative weights never win (previously NULL priority sorted
    # FIRST and zero-weight rows were guaranteed selections)
    assert ks == {3, 4, -7}
    # negative keys get a non-negative priority (pmod'd hash)
    assert all(r["priority"] >= 0 for r in res)


def test_ks_drift_empty_group_yields_null_not_garbage(spark):
    # src1 has zero rows — exactly the event a drift monitor should
    # flag; ks_ppm/ks_bin must be NULL, not floor(Inf)
    rows = [(i, "src0", 16 * i) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    row = CP.ks_drift(docs, bin_width=16).collect()[0]
    assert row["n1"] == 10
    assert row["n2"] == 0
    assert row["ks_ppm"] is None
    assert row["ks_bin"] is None


def test_ks_drift_no_rows_at_all_yields_nulls(spark):
    docs = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long"
    )
    row = CP.ks_drift(docs, bin_width=16).collect()[0]
    assert row["n_bins"] == 0
    assert row["ks_ppm"] is None
    assert row["ks_bin"] is None
