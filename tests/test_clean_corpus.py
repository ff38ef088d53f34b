"""End-to-end corpus cleaning: PII scrub unit behavior and the
exact→fuzzy dedup composition (idempotence is the defining property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.ext.dedup_fuzzy import clean_corpus
from monzo_data_pipeline_spark.functions.text import scrub_pii


def test_scrub_pii_redacts_each_kind(spark):
    rows = [
        (1, "contact me at alice.smith+x@example.co.uk for details"),
        (2, "docs at https://example.com/a?b=c#frag and more text"),
        (3, "call +44 (0)20 7946-0958 now"),
        (4, "server at 192.168.0.1 responded"),
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r["id"]: r["s"]
        for r in df.select("id", scrub_pii("t").alias("s")).collect()
    }
    assert got[1] == "contact me at <EMAIL> for details"
    assert got[2] == "docs at <URL> and more text"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "server at <IP> responded"
    assert got[5] == "no pii here at all"


def test_scrub_pii_url_wins_over_email(spark):
    # a URL containing an @ must become <URL>, not a mangled <EMAIL>
    df = spark.createDataFrame([(1, "see https://u:p@host.com/path ok")], ["id", "t"])
    assert (
        df.select(scrub_pii("t").alias("s")).first()["s"] == "see <URL> ok"
    )


def test_minhash_shingle_cap_bounds_state_keeps_recall(spark):
    from monzo_data_pipeline_spark.ext.dedup_fuzzy import minhash_near_dup_pairs

    # two long near-identical docs (shared 400-token body, one word
    # swapped) and one unrelated doc
    body = " ".join(f"tok{i}" for i in range(400))
    rows = [
        (1, body),
        (2, body.replace("tok200", "changed")),
        (3, " ".join(f"other{i}" for i in range(400))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in exact and len(exact) == 1

    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            docs, threshold=0.5, max_shingles_per_doc=50
        ).collect()
    }
    # bottom-k sketch keeps the pair and estimates its Jaccard
    assert (1, 2) in capped and len(capped) == 1
    assert abs(capped[(1, 2)] - exact[(1, 2)]) < 0.2

    # a cap above every doc's shingle count degenerates to exact
    uncapped_equiv = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            docs, threshold=0.5, max_shingles_per_doc=10_000
        ).collect()
    }
    assert uncapped_equiv == exact


def test_clean_corpus_removes_exact_and_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.limit(60).cache()
    n_base = base.count()

    # plant one exact dup and one near dup (prefix perturbation) with
    # fresh ids above the base range
    exact_dup = base.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    near_dup = base.limit(1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = base.unionByName(exact_dup).unionByName(near_dup)

    cleaned = clean_corpus(corpus, threshold=0.5).cache()
    n_clean = cleaned.count()
    # both planted dups die; the original (min-id) rows survive
    assert n_clean <= n_base
    surviving_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert 1_000_000 not in {i - 0 for i in surviving_ids}
    assert all(i < 1_000_000 for i in surviving_ids)

    # idempotence: cleaning the cleaned corpus removes nothing
    again = clean_corpus(cleaned, threshold=0.5)
    assert again.count() == n_clean


def test_incremental_band_index_equals_full_recompute(spark, sf_dir):
    """Batch-composition law for the LSH index: indexing corpus A, then
    incrementally adding batch B, yields exactly the candidate pairs of
    indexing A ∪ B from scratch — bucket collision is per-pair, not
    per-batch. This is what makes near-dedup maintainable at 100 TB:
    new data is shingled once, the stored corpus never again."""
    from monzo_data_pipeline_spark.ext.dedup_fuzzy import (
        band_index,
        incremental_candidate_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").limit(80).cache()
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    # full recompute over A ∪ B
    full = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }

    # stored index over A; B arrives as a batch
    idx_a = band_index(minhash_signatures(a))
    pairs_a = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(a)).collect()
    }
    inc_pairs, new_idx = incremental_candidate_pairs(b, idx_a)
    inc = {(r["doc_a"], r["doc_b"]) for r in inc_pairs.collect()}

    assert pairs_a | inc == full
    # the appended index rows are exactly B's banding
    assert new_idx.count() == minhash_signatures(b).count() * 16


def test_pack_sequences_bins_fill_and_overflow_by_at_most_one(spark):
    from monzo_data_pipeline_spark.functions.text import pack_sequences

    # one shard (ids all ≡ 0 mod 1): tokens 4,4,4,4 with capacity 10 →
    # exclusive prefix sums 0,4,8,12 → bins 0,0,0,1
    rows = [(i, " ".join(["w"] * 4)) for i in range(4)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["shard"], r["bin"]): (r["n_docs"], r["total_tokens"])
        for r in pack_sequences(docs, capacity=10, n_shards=1).collect()
    }
    assert got == {(0, 0): (3, 12), (0, 1): (1, 4)}


def test_contamination_check_flags_planted_overlap(spark):
    from monzo_data_pipeline_spark.ext.dedup_fuzzy import contamination_check

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            # contains a 7-token span of the benchmark → 3 shared 5-shingles
            (1, "x y " + " ".join(bench_text.split()[:7]) + " z"),
            (2, "completely unrelated text with many different words here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, bench_text)], ["doc_id", "text"])
    got = contamination_check(train, bench, min_overlap=3).collect()
    assert [(r["train_doc"], r["bench_doc"], r["n_overlap"]) for r in got] == [
        (1, 100, 3)
    ]


def test_prepare_training_corpus_end_to_end(spark, sf_dir):
    from monzo_data_pipeline_spark.ext.dedup_fuzzy import prepare_training_corpus

    docs = load_table(spark, sf_dir, "documents").limit(60).cache()
    # plant: an exact dup of doc A, and a training doc copying the
    # benchmark doc's text (contamination)
    first = docs.limit(1)
    bench = first.select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    ).cache()
    dup = first.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(dup)

    clean, packed = prepare_training_corpus(
        corpus,
        benchmark=bench,
        threshold=0.5,
        pack_capacity=256,
    )
    clean = clean.cache()
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert all(i < 1_000_000 for i in ids)  # planted dup removed
    # the benchmark-copy source doc is decontaminated away
    first_id = first.collect()[0]["doc_id"]
    assert first_id not in ids
    # packing covers every surviving token exactly once
    tok_total = clean.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0]["t"]
    packed_total = packed.agg(F.sum("total_tokens").alias("t")).collect()[0]["t"]
    assert packed_total == tok_total
    assert packed.count() >= 1


def test_curriculum_sample_keeps_more_high_quality(spark):
    from monzo_data_pipeline_spark.functions.text import curriculum_sample

    # 100 low-quality docs (punct soup) + 100 fluent docs; ids interleave
    low = [(i, "!!! ??? ### $$$ %%%") for i in range(0, 200, 2)]
    high = [
        (i, "the quick brown fox and the lazy dog were on the hill " * 3)
        for i in range(1, 200, 2)
    ]
    df = spark.createDataFrame(low + high, "doc_id bigint, text string")
    kept = curriculum_sample(df).collect()
    kept_low = sum(1 for r in kept if r.doc_id % 2 == 0)
    kept_high = sum(1 for r in kept if r.doc_id % 2 == 1)
    # fluent docs land in higher tiers -> higher keep rates
    assert kept_high > kept_low
    # every kept fluent doc out-tiers every kept punct-soup doc
    high_tiers = {r.tier for r in kept if r.doc_id % 2 == 1}
    low_tiers = {r.tier for r in kept if r.doc_id % 2 == 0}
    assert min(high_tiers) > max(low_tiers)
    # deterministic: same result twice
    again = curriculum_sample(df).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in kept)


def test_minhash_hash_families_agree_on_verified_pairs(spark):
    """The engine-agnostic poly family and the native xxhash family
    share everything after the hash: verified (doc_a, doc_b, jaccard)
    pairs must coincide on a corpus with clear near-dups (banding
    recall at jaccard >= 0.8 is ~1 for both 16x4 schemes)."""
    import pytest as _pt

    from monzo_data_pipeline_spark.ext import dedup_fuzzy as DF

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [(i, base) for i in range(3)]  # identical triplet
    rows += [(10 + i, base + "extra tail words here") for i in range(2)]
    rows += [(100, "completely different text with nothing shared at all "
                   "purple monkey dishwasher quantum")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {}
    for fam in ("xxhash", "poly"):
        out[fam] = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in DF.minhash_near_dup_pairs(
                docs, threshold=0.6, hash_family=fam
            ).collect()
        }
    assert out["xxhash"] == out["poly"]
    assert len(out["poly"]) >= 4  # the identical triplet + tail pair survive
    with _pt.raises(ValueError):
        DF.minhash_near_dup_pairs(docs, hash_family="md5")
