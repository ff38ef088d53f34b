"""Search-engine ops (ext/search.py): inverted index, log-free BM25,
corpus-adaptive stopword removal — hermetic inline fixtures."""

from __future__ import annotations

from monzo_data_pipeline_spark.ext import search as SRCH


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_inverted_index_postings_and_df(spark):
    df = _docs(
        spark,
        [(1, "a b a"), (2, "b c"), (3, "c b"), (4, "zonly")],
    )
    out = {
        r.word: r
        for r in SRCH.inverted_index(df, min_df=2, max_postings=10).collect()
    }
    # 'zonly' (df=1) is below min_df; 'a' appears in one doc only
    assert set(out) == {"b", "c"}
    assert out["b"].df == 3 and out["b"].postings == [1, 2, 3]
    assert out["b"].total_tf == 3
    assert out["c"].postings == [2, 3]


def test_inverted_index_caps_postings_deterministically(spark):
    df = _docs(spark, [(i, "x") for i in range(10)])
    row = SRCH.inverted_index(df, min_df=2, max_postings=3).collect()[0]
    assert row.df == 10 and row.postings == [0, 1, 2]


def test_bm25_favors_matching_rare_terms(spark):
    df = _docs(
        spark,
        [
            (1, "spark hash merge"),  # all three query terms
            (2, "spark filler filler filler filler filler"),  # one, long doc
            (3, "spark hash"),  # two terms, short doc
            (4, "nothing here"),
        ],
    )
    rows = SRCH.bm25_scores(df, terms=("spark", "hash", "merge")).collect()
    ids = [r.doc_id for r in rows]
    assert 4 not in ids  # no query term → unmatched
    assert ids[0] == 1  # most matched terms, shortest doc wins
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].n_terms_matched == 3
    assert by_id[3].score_q > by_id[2].score_q  # more terms beat length


def test_adaptive_stopword_filter_preserves_order(spark):
    # 'the' is in 3/4 docs (75% ≥ 50%) → removed; others stay in order
    df = _docs(
        spark,
        [
            (1, "the quick fox"),
            (2, "over the moon"),
            (3, "the end"),
            (4, "no stopwords here"),
        ],
    )
    out = {r.doc_id: r for r in SRCH.adaptive_stopword_filter(df).collect()}
    assert out[1].clean_text == "quick fox" and out[1].n_removed == 1
    assert out[2].clean_text == "over moon"
    assert out[4].clean_text == "no stopwords here" and out[4].n_removed == 0


def test_adaptive_stopword_filter_all_removed_yields_empty(spark):
    df = _docs(spark, [(1, "the"), (2, "the"), (3, "the a")])
    out = {r.doc_id: r for r in SRCH.adaptive_stopword_filter(df).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 1
    assert out[3].clean_text == "a"


def test_adjacency_edges_counts(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "b a")])
    out = {(r.src, r.dst): r.w for r in SRCH.adjacency_edges(df).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 2}


def test_textrank_hub_outranks_leaf(spark):
    # 'hub' is pointed at from every other word; leaves only get teleport
    df = _docs(
        spark,
        [(1, "x hub y hub z hub"), (2, "w hub x hub")],
    )
    rows = SRCH.textrank_keywords(df, iters=3, top_k=10).collect()
    ranks = {r.word: r.rank_q for r in rows}
    assert max(ranks, key=ranks.get) == "hub"
    assert ranks["hub"] > ranks["x"] > 0


def test_textrank_rank_conserved_order(spark):
    # deterministic: two runs produce identical rows in identical order
    df = _docs(spark, [(1, "p q r p q"), (2, "q r p")])
    a = [tuple(r) for r in SRCH.textrank_keywords(df, iters=3).collect()]
    b = [tuple(r) for r in SRCH.textrank_keywords(df, iters=3).collect()]
    assert a == b and len(a) > 0


def test_incremental_index_equals_full_recompute(spark):
    full = _docs(
        spark,
        [(1, "a b a"), (2, "b c"), (3, "c b a"), (4, "d b")],
    )
    b1, b2 = full.filter("doc_id <= 2"), full.filter("doc_id > 2")
    # incremental: tokenize each batch alone, union the tf STATE,
    # summarize once — never re-tokenizing earlier batches
    state = SRCH.doc_term_frequencies(b1).unionByName(
        SRCH.doc_term_frequencies(b2)
    )
    def norm(rows):
        return {(r.word, r.df, r.total_tf, tuple(r.postings)) for r in rows}

    inc = norm(SRCH.summarize_index(state, min_df=1).collect())
    one_shot = norm(SRCH.inverted_index(full, min_df=1).collect())
    assert inc == one_shot and len(inc) > 0


def test_textrank_empty_corpus_returns_empty(spark):
    # no adjacency edges (empty and single-token corpora): empty
    # result frame, not ZeroDivisionError
    empty = _docs(spark, [])
    one_tok = _docs(spark, [(1, "solo")])
    assert SRCH.textrank_keywords(empty).count() == 0
    got = SRCH.textrank_keywords(one_tok)
    assert got.count() == 0
    assert got.columns == ["word", "rank_q"]


def test_sharded_index_merge_is_shard_count_invariant(spark, sf_dir):
    """merge_shards(shard_postings(tf, R)) == summarize_index(tf) for
    any doc_range R — the sharded representation loses nothing."""
    from monzo_data_pipeline_spark.catalog import load_table

    tf = SRCH.doc_term_frequencies(load_table(spark, sf_dir, "documents"))

    def norm(df):
        return {
            (r.word, r.df, r.total_tf, tuple(r.postings))
            for r in df.collect()
        }

    want = norm(SRCH.summarize_index(tf, min_df=2, max_postings=1000))
    for doc_range in (7, 100, 10_000_000):  # many shards … one shard
        got = norm(
            SRCH.merge_shards(
                SRCH.shard_postings(tf, doc_range=doc_range),
                min_df=2,
                max_postings=1000,
            )
        )
        assert got == want, f"doc_range={doc_range}"
    assert len(want) > 0


def test_shard_postings_rows_bounded_by_doc_range(spark, sf_dir):
    from monzo_data_pipeline_spark.catalog import load_table

    tf = SRCH.doc_term_frequencies(load_table(spark, sf_dir, "documents"))
    sharded = SRCH.shard_postings(tf, doc_range=25)
    import pyspark.sql.functions as F

    too_big = sharded.filter(F.size("postings") > 25).count()
    assert too_big == 0


# --- ANN recall evaluation (r10) ---------------------------------------------


def test_ann_recall_eval_bounds_and_exact_probe(spark, sf_dir):
    """recall_ppm in [0, 10^6] for every query; probing ALL cells
    makes the IVF path exhaustive, so recall must be exactly 10^6."""
    import pyspark.sql.functions as F

    from monzo_data_pipeline_spark.catalog import load_table
    from monzo_data_pipeline_spark.ext.similarity import ann_recall_eval

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 57]
    part = ann_recall_eval(emb, qids, k=5, n_centroids=16, n_probe=3)
    rows = part.collect()
    assert [r.qid for r in rows] == sorted(qids)
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hit <= 5
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_exact

    full = ann_recall_eval(emb, qids, k=5, n_centroids=16, n_probe=16)
    assert all(r.recall_ppm == 1_000_000 for r in full.collect())
    # more probes never lower recall (monotone knob)
    part1 = {
        r.qid: r.recall_ppm
        for r in ann_recall_eval(
            emb, qids, k=5, n_centroids=16, n_probe=1
        ).collect()
    }
    part3 = {r.qid: r.recall_ppm for r in rows}
    for qid in qids:
        assert part1[qid] <= part3[qid]


def test_ann_recall_eval_matches_multiprobe_singleton(spark, sf_dir):
    """For one query id the approx side must agree with the existing
    ivf_topk_multiprobe operator (same probe rule, same tie-breaks):
    recall computed here == recall computed from its output."""
    from monzo_data_pipeline_spark.catalog import load_table
    from monzo_data_pipeline_spark.ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    qid, k, n_probe = 123, 7, 2
    got = SIM.ann_recall_eval(
        emb, [qid], k=k, n_centroids=16, n_probe=n_probe
    ).collect()[0]
    approx_ids = {
        r.vec_id
        for r in SIM.ivf_topk_multiprobe(
            emb, query_id=qid, n_centroids=16, k=k, n_probe=n_probe
        ).collect()
    }
    exact_ids = {
        r.vec_id
        for r in SIM.knn_join(
            emb,
            emb.filter(f"vec_id = {qid}").selectExpr(
                "vec_id AS query_id", "embedding"
            ),
            k=k,
        ).collect()
    }
    assert got.n_hit == len(exact_ids & approx_ids)


def test_textrank_driver_finish_matches_distributed(spark, monkeypatch):
    """r11: textrank's bounded driver finisher (exact Python integer
    rounds under the graph family's collect caps) must match the
    distributed child-session iteration row-for-row."""
    from monzo_data_pipeline_spark.ext import graph as G

    df = _docs(
        spark,
        [(1, "p q r p q s t p"), (2, "q r p t s"), (3, "s t q p")],
    )
    drv = [tuple(r) for r in SRCH.textrank_keywords(df, iters=3).collect()]
    monkeypatch.setattr(G, "ITER_DRIVER_FINISH_NODES", 0)
    monkeypatch.setattr(G, "ITER_DRIVER_FINISH_EDGES", 0)
    dist = [tuple(r) for r in SRCH.textrank_keywords(df, iters=3).collect()]
    assert drv == dist and len(drv) > 0
