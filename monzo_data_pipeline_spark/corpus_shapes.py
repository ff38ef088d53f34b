"""Round-4 query shapes: web-corpus curation (CCNet-style passage
dedup, hashed linear quality classification, deterministic splits,
positional phrase search, KS drift monitoring, repeat collapse).

Registered through the same decorator as the main registry (the
`warehouse_shapes.py` / `fin_curation_shapes.py` pattern) and
appended AFTER the earlier rounds' entries, so the driver's
checked-prefix of the registry stays stable across rounds.

Reference parity: the reference dedups and default-fills card
transactions (reference/src/sql/transform_bronze_to_silver.sql);
these are the same moves over a text corpus — the north-star
training-data surface (SURVEY.md §2.C4), implemented in
ext/corpus.py.

Every oracle twin shares the engine-agnostic (acc·131 + code) mod
2³¹−1 polynomial hash family with functions/text.py, and every
count/sum output is CAST to BIGINT so DuckDB HUGEINT never reaches
the driver's pandas canonicalizer as float64 (the r3 lesson —
tools/dtype_audit.py enforces this registry-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .catalog import load_table
from .ext import corpus as CP
from .operators import filters as FLT

_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _fold_sql(expr: str) -> str:
    """DuckDB twin of ext/corpus._char_fold over string ``expr``."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ascii({expr}[i]) AS BIGINT))), "
        "(a, b) -> (a * 131 + b) % 2147483647)"
    )


def register(_register) -> None:
    @_register(
        "corpus_segment_dedup",
        "north-star C4 (CCNet-style corpus-wide duplicated-passage "
        "removal: 8-token segments hashed, counted corpus-wide, docs "
        "rebuilt from globally-unique segments; ordered kept_fold pins "
        "content AND order — ext/corpus.py::segment_dedup)",
        rf"""
        WITH d AS (
            SELECT doc_id, {_TOKS} AS toks
            FROM documents WHERE trim(text) <> ''
        ), s0 AS (
            SELECT doc_id, toks,
                   unnest(range(0, (len(toks) + 7) // 8)) AS j
            FROM d
        ), s AS (
            SELECT doc_id, CAST(j AS BIGINT) AS seg_idx,
                   array_to_string(
                     toks[(CAST(j AS INT) * 8 + 1):(CAST(j AS INT) * 8 + 8)],
                     ' ') AS seg
            FROM s0
        ), h AS (
            SELECT doc_id, seg_idx, {_fold_sql('seg')} AS h FROM s
        ), c AS (
            SELECT h, COUNT(*) AS cnt FROM h GROUP BY h
        ), k AS (
            SELECT doc_id, seg_idx, h.h AS h, (cnt <= 1) AS kept
            FROM h JOIN c USING (h)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   COALESCE(list(h ORDER BY seg_idx) FILTER (WHERE kept),
                            CAST([] AS BIGINT[]))),
                 (a, b) -> (a * 131 + b) % 2147483647) AS kept_fold
        FROM k GROUP BY doc_id
        """,
    )
    def q_corpus_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.segment_dedup(docs, seg_len=8, max_count=1)

    @_register(
        "quality_classifier_scores",
        "north-star C4 (fastText-style hashed bag-of-words linear "
        "classifier inference: token → 4096 feature buckets → fixed "
        "LCG weights → per-doc score + accept label, zero shuffle — "
        "ext/corpus.py::hashed_quality_scores)",
        rf"""
        WITH d AS (
            SELECT doc_id, {_TOKS} AS toks
            FROM documents WHERE trim(text) <> ''
        ), h AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   list_transform(toks, t -> {_fold_sql('t')}) AS th
            FROM d
        ), w AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(list_sum(
                     list_transform(th,
                       h -> ((h % 4096) * 1103515245 + 12345) % 2001 - 1000)
                   ), 0) AS BIGINT) AS score
            FROM h
        )
        SELECT doc_id, n_tokens, score, (score >= 0) AS accept FROM w
        """,
    )
    def q_quality_classifier_scores(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.hashed_quality_scores(docs, n_buckets=4096)

    @_register(
        "train_val_test_split",
        "north-star C4 (leak-proof deterministic 80/10/10 split via "
        "Knuth multiplicative hash on doc_id + per-(lang, source) "
        "stratification-share audit — ext/corpus.py::split_audit)",
        """
        WITH s AS (
            SELECT lang, source,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT lang, source,
                       (((doc_id % 2147483647 + 2147483647) % 2147483647)
                         * 2654435761) % 2147483647 % 100 AS b
                FROM documents
            )
        ), c AS (
            SELECT lang, source, split, COUNT(*) AS n_docs
            FROM s GROUP BY lang, source, split
        ), t AS (
            SELECT lang, source, SUM(n_docs) AS tot
            FROM c GROUP BY lang, source
        )
        SELECT lang, source, split, CAST(n_docs AS BIGINT) AS n_docs,
               CAST((n_docs * 1000000) // tot AS BIGINT) AS share_ppm
        FROM c JOIN t USING (lang, source)
        """,
    )
    def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.split_audit(docs)

    @_register(
        "phrase_search",
        "north-star C4 (positional phrase search 'table hash': "
        "explode → selective word filter → (doc, pos+1) equi-join, "
        "top-20 docs — ext/corpus.py::phrase_match)",
        r"""
        WITH d AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), m AS (
            SELECT doc_id,
                   CAST(len(list_filter(range(1, len(t)),
                     i -> t[i] = 'table' AND t[i+1] = 'hash')) AS BIGINT)
                     AS n_matches
            FROM d
        )
        SELECT doc_id, n_matches FROM m WHERE n_matches > 0
        ORDER BY n_matches DESC, doc_id LIMIT 20
        """,
    )
    def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.phrase_match(docs, "table hash", k=20)

    @_register(
        "distribution_drift_ks",
        "north-star (two-sample Kolmogorov–Smirnov drift between "
        "sources src0/src1 over binned n_chars: bounded-bin agg + "
        "single-row CDF fold, no window — ext/corpus.py::ks_drift; "
        "fixed-order IEEE doubles, COVERAGE.md determinism #1)",
        """
        WITH f AS (
            SELECT n_chars // 16 AS bin, source
            FROM documents WHERE source IN ('src0', 'src1')
        ), c AS (
            SELECT bin,
                   SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
            FROM f GROUP BY bin
        ), t AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(COUNT(*) AS BIGINT) AS n_bins
            FROM c
        ), cum AS (
            SELECT bin,
                   CAST(SUM(c1) OVER (ORDER BY bin) AS BIGINT) AS cum1,
                   CAST(SUM(c2) OVER (ORDER BY bin) AS BIGINT) AS cum2
            FROM c
        ), diffs AS (
            SELECT bin,
                   abs(CAST(cum1 AS DOUBLE) * 1000000.0 / CAST(n1 AS DOUBLE)
                     - CAST(cum2 AS DOUBLE) * 1000000.0 / CAST(n2 AS DOUBLE))
                     AS diff
            FROM cum, t
        )
        SELECT n_bins, n1, n2,
               CASE WHEN COALESCE(n1, 0) > 0 AND COALESCE(n2, 0) > 0 THEN
                 CAST(floor((SELECT MAX(diff) FROM diffs)) AS BIGINT)
               END AS ks_ppm,
               CASE WHEN COALESCE(n1, 0) > 0 AND COALESCE(n2, 0) > 0 THEN
                 (SELECT MIN(bin) FROM diffs
                  WHERE diff = (SELECT MAX(diff) FROM diffs))
               END AS ks_bin
        FROM t
        """,
    )
    def q_distribution_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.ks_drift(docs)

    @_register(
        "collapse_repeat_tokens",
        "north-star C4 (consecutive-duplicate token collapse, zero "
        "shuffle; ordered kept_fold pins the collapsed doc — "
        "ext/corpus.py::collapse_repeats)",
        rf"""
        WITH d AS (
            SELECT doc_id, {_TOKS} AS t
            FROM documents WHERE trim(text) <> ''
        ), k AS (
            SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                   list_transform(
                     list_filter(range(1, len(t) + 1),
                                 i -> i = 1 OR t[i] <> t[i-1]),
                     i -> t[i]) AS kept
            FROM d
        )
        SELECT doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(kept, s -> {_fold_sql('s')})),
                 (a, b) -> (a * 131 + b) % 2147483647) AS kept_fold
        FROM k
        """,
    )
    def q_collapse_repeat_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.collapse_repeats(docs)

    @_register(
        "weighted_priority_sample",
        "north-star (deterministic weighted sampling without "
        "replacement: keyed-hash priority DIV weight, k smallest — "
        "the integer twin of Efraimidis–Spirakis A-ES; map-side + "
        "TakeOrderedAndProject — operators/filters.py::"
        "weighted_priority_sample)",
        """
        WITH w AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS weight,
                   (((o_orderkey % 2147483647 + 2147483647) % 2147483647)
                     * 2654435761) % 2147483647 * 1000000 AS h6
            FROM orders
        )
        SELECT o_orderkey, weight, h6 // weight AS priority
        FROM w WHERE weight > 0
        ORDER BY priority, o_orderkey LIMIT 100
        """,
    )
    def q_weighted_priority_sample(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        return FLT.weighted_priority_sample(
            orders, cents, key_col="o_orderkey", k=100
        )

    @_register(
        "source_vocab_jaccard",
        "north-star C4 (pairwise source-vocabulary Jaccard: distinct "
        "(source, word) → word-keyed self-join bounded by n_sources² "
        "per word, sizes broadcast back — "
        "ext/corpus.py::source_vocab_jaccard)",
        r"""
        WITH e AS (
            SELECT source AS src,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                     AS word
            FROM documents WHERE trim(text) <> ''
        ), v AS (
            SELECT DISTINCT src, word FROM e
        ), s AS (
            SELECT src, COUNT(*) AS vsize FROM v GROUP BY src
        ), i AS (
            SELECT a.src AS source_a, b.src AS source_b,
                   COUNT(*) AS n_inter
            FROM v a JOIN v b ON a.word = b.word
            WHERE a.src < b.src
            GROUP BY a.src, b.src
        )
        SELECT source_a, source_b,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(sa.vsize + sb.vsize - n_inter AS BIGINT) AS n_union,
               CAST((n_inter * 1000000)
                    // (sa.vsize + sb.vsize - n_inter) AS BIGINT)
                 AS jaccard_ppm
        FROM i
        JOIN s sa ON sa.src = i.source_a
        JOIN s sb ON sb.src = i.source_b
        """,
    )
    def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return CP.source_vocab_jaccard(docs)

    _SCORE_CTE = rf"""
        d AS (
            SELECT doc_id, lang, {_TOKS} AS toks
            FROM documents WHERE trim(text) <> ''
        ), w AS (
            SELECT doc_id, lang,
                   CAST(COALESCE(list_sum(
                     list_transform(
                       list_transform(toks, t -> {_fold_sql('t')}),
                       h -> ((h % 4096) * 1103515245 + 12345) % 2001
                            - 1000)
                   ), 0) AS BIGINT) AS score
            FROM d
        )"""

    @_register(
        "score_calibration_bins",
        "C4/north-star (r9: classifier CALIBRATION table — the hashed "
        "quality scores binned into 10 equal-width bands over the "
        "observed range, per band the count, mean score (milli) and "
        "positive-label rate (ppm) against the lang=='en' label; the "
        "reliability-diagram/ECE input a labeling pipeline checks "
        "before trusting an accept threshold; all floor'd fixed-point "
        "integers, one fact agg after a 1-row min/max broadcast — "
        "pipeline/quality.py::calibration_bins)",
        f"""
        WITH {_SCORE_CTE}, j AS (
            SELECT score, CAST(lang = 'en' AS BIGINT) AS y FROM w
            WHERE score IS NOT NULL AND lang IS NOT NULL
        ), rng AS (
            SELECT MIN(score) AS lo, MAX(score) AS hi FROM j
        ), b AS (
            SELECT (score - lo) * 10 // (hi - lo + 1) AS bin, score, y
            FROM j CROSS JOIN rng
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(score) AS HUGEINT) * 1000 // COUNT(*)
                    AS BIGINT) AS mean_score_milli,
               CAST(CAST(SUM(y) AS HUGEINT) * 1000000 // COUNT(*)
                    AS BIGINT) AS pos_rate_ppm
        FROM b GROUP BY bin ORDER BY bin
        """,
    )
    def q_score_calibration_bins(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from .pipeline.quality import calibration_bins

        docs = load_table(spark, sf_dir, "documents")
        scored = CP.hashed_quality_scores(docs, n_buckets=4096)
        labeled = scored.join(
            docs.select("doc_id", (F.col("lang") == "en").alias("y")),
            "doc_id",
        )
        return calibration_bins(labeled, "score", "y", n_bins=10)

    @_register(
        "cohens_kappa_labels",
        "C4/north-star (r9: Cohen's kappa between the hashed quality "
        "classifier's accept flag and the lang=='en' heuristic label "
        "— the inter-annotator agreement gate a labeling pipeline "
        "runs; kappa = (po - pe)/(1 - pe) multiplied through by N^2 "
        "so the ppm output is one DIV of exact DECIMAL(38,0) "
        "products; single contingency aggregate — pipeline/"
        "quality.py::cohens_kappa)",
        f"""
        WITH {_SCORE_CTE}, j AS (
            SELECT CAST(score >= 0 AS BIGINT) AS a,
                   CAST(lang = 'en' AS BIGINT) AS b
            FROM w
        ), s AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS N,
                   CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END)
                        AS HUGEINT) AS po,
                   CAST(SUM(a) AS HUGEINT) AS ra1,
                   CAST(SUM(b) AS HUGEINT) AS rb1
            FROM j
        )
        SELECT CAST(N AS BIGINT) AS n,
               CAST(po * 1000000 // N AS BIGINT) AS po_ppm,
               CAST((ra1 * rb1 + (N - ra1) * (N - rb1)) * 1000000
                    // (N * N) AS BIGINT) AS pe_ppm,
               CASE WHEN N * N = ra1 * rb1 + (N - ra1) * (N - rb1)
                    THEN NULL ELSE
                 CAST((po * N - (ra1 * rb1 + (N - ra1) * (N - rb1)))
                      * 1000000
                      // (N * N - (ra1 * rb1 + (N - ra1) * (N - rb1)))
                      AS BIGINT) END AS kappa_ppm
        FROM s
        """,
    )
    def q_cohens_kappa_labels(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from .pipeline.quality import cohens_kappa

        docs = load_table(spark, sf_dir, "documents")
        scored = CP.hashed_quality_scores(docs, n_buckets=4096)
        labeled = scored.join(
            docs.select("doc_id", (F.col("lang") == "en").alias("y")),
            "doc_id",
        )
        return cohens_kappa(labeled, "accept", "y")
