"""Text-analysis functions — SURVEY.md §2.C4 and the north-star
training-data-pipeline text operators (language-ID, quality scoring,
token counting, fingerprinting) over the `documents` table.

All pure built-in column expressions (codegen, no Python UDFs) so a
100 TB corpus pays zero serialization tax: each function returns a
Column usable inside any select/groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out

# A small English stopword set for ratio features (public knowledge).
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "for on with as at by from"
).split()


def tokens(text: Column | str, pattern: str = r"\s+") -> Column:
    """C4 — whitespace tokenization: split on runs of whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), pattern)


def token_count(text: Column | str) -> Column:
    """Token counting (north star): whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Token counting (north star): a BPE-ish proxy — count of
    word/number/punctuation fragments from a tokenizer-style regex.
    Deterministic and cheap; a real BPE vocab lookup would be a
    pandas UDF over a broadcast vocab (ext/multimodal.py pattern).
    """
    c = F.col(text) if isinstance(text, str) else text
    frags = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(frags)


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy contiguous sequence packing: assign whole documents to
    fixed-token-budget training bins (the sample-packing step that
    turns a cleaned corpus into uniform training shards).

    A document lands in the bin its exclusive prefix-sum of tokens
    falls in, so bins fill to `capacity` and overflow by at most one
    document — the standard contiguous-packing compromise that keeps
    assignment ONE window pass instead of a sequential first-fit scan.

    Scale: the prefix sum is per `shard = doc_id % n_shards`, never a
    global ORDER BY (a single-partition window is the classic 100 TB
    cliff); shards pack independently, exactly how a multi-writer
    shard layout works. Deterministic: (shard, doc_id) is a total
    order. Returns one row per (shard, bin): doc/token totals + the
    doc_id span.
    """
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        token_count(F.col(text_col)).alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    packed = base.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / capacity).cast("long"),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def char_length(text: Column | str) -> Column:
    """C4 — character length."""
    return F.length(F.col(text) if isinstance(text, str) else text)


def punct_ratio(text: Column | str) -> Column:
    """Quality scoring: punctuation chars / total chars."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    """Quality scoring: stopword tokens / total tokens."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Quality scoring (north star): a deterministic composite in [0,1] —
    rewards stopword presence (fluent prose) and length, penalizes
    punctuation soup. Weights are engine policy, not learned."""
    c = F.col(text) if isinstance(text, str) else text
    length_feat = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * length_feat + 0.4 * stopword_ratio(c) + 0.2 * (1.0 - punct_ratio(c)), 6
    )


def ascii_ratio(text: Column | str) -> Column:
    """Language-ID feature: fraction of ASCII characters."""
    c = F.col(text) if isinstance(text, str) else text
    n_ascii = F.length(F.regexp_replace(c, r"[^\x00-\x7F]", ""))
    return n_ascii / F.greatest(F.length(c), F.lit(1))


def lang_id_heuristic(text: Column | str) -> Column:
    """Language-ID (north star): n-gram/stopword heuristic — 'en' when
    English stopwords dominate, 'other_latin' for ASCII-heavy
    non-English, 'non_latin' otherwise. Deliberately simple and
    deterministic; swapping in a real model = one pandas UDF behind
    the same column contract."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.when(stopword_ratio(c) >= 0.15, F.lit("en"))
        .when(ascii_ratio(c) >= 0.9, F.lit("other_latin"))
        .otherwise(F.lit("non_latin"))
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Document fingerprinting (north star): 64-bit content hash of the
    normalized text (xxhash64 — stable across Spark runs/partitions).
    The rolling/shingled variant lives in ext/dedup_fuzzy.py."""
    c = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(F.lower(F.trim(c)))


def doc_fingerprint_portable(text: Column | str) -> Column:
    """Engine-agnostic 62-bit content fingerprint of the normalized
    text: the two-base polynomial fold family (ext/dedup_fuzzy.py::
    _poly_hash62, bases 131/137 mod 2³¹−1) over lower(trim(text)) —
    every step integer arithmetic both Spark and DuckDB reproduce
    exactly, so the fingerprint is oracle-checkable AND stable across
    engines, not just across Spark runs. Use this when fingerprints
    must survive an engine migration; `doc_fingerprint` (xxhash64,
    JVM-native) is the faster single-engine path."""
    from ..ext.dedup_fuzzy import _poly_hash62

    c = F.col(text) if isinstance(text, str) else text
    return _poly_hash62(F.lower(F.trim(c)))


def word_frequencies(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 — corpus word frequencies: lower→split→explode→count.

    The explode is map-side (no shuffle until the count agg, which is
    partial-aggregated); at 100 TB the hot keys (stopwords) are
    exactly the keys partial aggregation collapses best.
    """
    # r10 (guide §2.5): single-row-group scans arrive as ONE task; fan
    # the docs out so the tokenize/explode/partial-agg stage uses every
    # core (no-op when the input is already wide)
    return (
        fan_out(documents.select(F.col(text_col)))
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tf_rarity_top_terms(
    documents: DataFrame, text_col: str = "text", top_per_doc: int = 3
) -> DataFrame:
    """C4/north-star — TF-IDF-style salient-term extraction, top-k per doc.

    score = tf · (N+1)/(df+1): the smoothed *rarity ratio* replaces the
    usual log-idf because ln() is libm-dependent (not IEEE-pinned), so
    Spark(JVM) and other engines can disagree in the last ulp — while
    +,·,/ are IEEE-exact-rounded and bit-identical everywhere. Same
    ranking semantics (monotone in tf and 1/df), cross-engine exact.

    Plan: one explode→(doc,word) count, one word-level df agg (broadcast
    back — vocabulary ≪ corpus), one 1-row N broadcast, one per-doc
    top-k window. At 100 TB the only big shuffle is the (doc,word)
    count; df and N are tiny after partial aggregation.
    """
    toks = fan_out(documents, "doc_id").select(
        F.col("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
    ).filter(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(df_), "word")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score_q",
            F.floor(
                (F.col("tf") * (F.col("n_docs") + 1)).cast("double")
                / (F.col("df") + 1).cast("double")
                * F.lit(1000000.0)
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_q"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_per_doc)
        .select("doc_id", "word", "tf", "df", "score_q", "rank")
    )


def chunk_documents(
    documents: DataFrame,
    text_col: str = "text",
    chunk_size: int = 500,
    stride: int = 400,
) -> DataFrame:
    """North-star — fixed-size overlapping character chunking (the
    standard pre-tokenization split for LLM training shards).

    chunk i covers [i·stride, i·stride + chunk_size); overlap =
    chunk_size − stride. Implemented as sequence→explode→substring:
    pure codegen'd JVM expressions, no Python, no shuffle at all —
    chunking is embarrassingly parallel and stays map-side.
    """
    c = F.col(text_col)
    n_chunks_m1 = F.floor((F.length(c) - 1) / F.lit(stride)).cast("int")
    return (
        documents.filter(F.length(c) > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks_m1)).alias("chunk_idx"),
            c.alias("__t"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.col("__t"), F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def adjacent_pairs(toks: Column | str) -> Column:
    """Adjacent (a, b) token pairs as array<struct<a,b>> — THE shared
    bigram extractor (bigram_counts / pmi_collocations /
    bigram_rarity_scores all build on it). Callers must gate
    size(toks) >= 2 first: Spark's sequence(1, 0) counts DOWN, so an
    ungated single-token array would yield a bogus pair."""
    c = F.col(toks) if isinstance(toks, str) else toks
    return F.zip_with(
        F.slice(c, 1, F.size(c) - 1),
        F.slice(c, 2, F.size(c) - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def bigram_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 — corpus bigram frequencies via an array-lambda transform
    (no self-join): token array → adjacent-pair strings → explode →
    count. All JVM-side higher-order functions."""
    toks = (
        fan_out(documents.filter(F.trim(F.col(text_col)) != ""))
        .select(tokens(F.lower(F.col(text_col))).alias("toks"))
        # single-token docs: sequence(1, 0) counts DOWN in Spark — gate it
        .filter(F.size("toks") >= 2)
    )
    bigrams = toks.select(
        F.explode(
            F.transform(
                adjacent_pairs("toks"), lambda p: F.concat_ws(" ", p["a"], p["b"])
            )
        ).alias("bigram")
    )
    return bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))


def token_repetition_stats(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signal per doc: frequency of the most
    common token over total tokens (≈1 ⇒ degenerate repetition).

    Explode → (doc, token) count → per-doc max/sum. Two hash aggs on
    the doc key (codegen, map-side partial) — NOT an array map-fold:
    higher-order map-building lambdas are interpreted per element and
    O(distinct²) per doc (cf. the simhash rewrite note)."""
    toks = (
        fan_out(documents, id_col)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return toks.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.max("n").alias("top_token_n"),
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias(
            "top_token_ratio"
        ),
    )


def dup_ngram_stats(
    documents: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicate-n-gram fraction: 1 − distinct/total n-grams
    (repetition signal over longer spans than top_token_ratio).
    Explode → two counts per doc; one shuffle on doc_id."""
    c = F.col(text_col)
    toks = tokens(F.lower(c))
    grams = F.expr(
        f"transform(sequence(1, size(__toks) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__toks, i, {n})))"
    )
    per = (
        fan_out(documents, id_col)
        .select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(id_col, F.explode(grams).alias("g"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("g").alias("n_distinct"),
        )
    )
    return per.select(
        id_col,
        "n_grams",
        "n_distinct",
        (
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double")
        ).alias("dup_fraction"),
    )


# PII scrubbing patterns (training-data cleaning). Java-regex syntax
# (JVM-side regexp_replace); ordered so URLS go before EMAILS (a URL
# can contain an @) — each replacement is a single linear pass.
PII_PATTERNS = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # last: the loosest pattern — would otherwise swallow IPs
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Redact URLs / emails / phone numbers / IPv4s with typed
    placeholder tokens — the standard pre-training scrub pass. Chained
    JVM regexp_replace; order matters (see PII_PATTERNS)."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def curriculum_sample(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rates: tuple[int, ...] = (10, 25, 50, 100),
) -> DataFrame:
    """Quality-curriculum corpus sampling: score every document
    (quality_score), tier the corpus by score quartiles, and keep a
    per-tier percentage via keyed modular arithmetic (10% of the worst
    quartile ... 100% of the best by default) — the standard
    quality-weighted reweighting before LLM pre-training.

    Deterministic end to end: the composite score is rounded (fixed
    policy), the tier cutpoints are rounded interpolated quantiles
    broadcast as one array row, and the keep decision is id % 100 <
    rate — reproducible across engines, runs, and partitionings,
    and incrementally stable (a new batch doesn't re-decide old docs,
    cf. source_mixture_sample). One corpus scan + one tiny quantile
    aggregate; no shuffle of the corpus itself.
    """
    n_tiers = len(rates)
    scored = documents.select(
        id_col, quality_score(text_col).alias("quality")
    )
    pcts = F.array(*[F.lit(i / n_tiers) for i in range(1, n_tiers)])
    cuts = scored.agg(
        F.transform(F.percentile("quality", pcts), lambda q: F.round(q, 6)).alias(
            "cuts"
        )
    )
    tiered = scored.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "quality",
        F.size(F.filter(F.col("cuts"), lambda q: q < F.col("quality")))
        .cast("bigint")
        .alias("tier"),
    )
    rate_arr = F.array(*[F.lit(r) for r in rates])
    return tiered.filter(
        F.col(id_col) % 100
        < F.element_at(rate_arr, (F.col("tier") + 1).cast("int"))
    )


# ---------------------------------------------------------------------------
# Round 2 — oracle-exact fingerprinting and collocation/diversity
# signals. All integer arithmetic (mod 2^31−1 polynomial hashes,
# integer DIV), so unlike xxhash64-based doc_fingerprint these are
# hash-checkable against a DuckDB twin, not rows-only.
# ---------------------------------------------------------------------------

POLY_MOD = 2_147_483_647  # 2^31 − 1: acc·131 + 126 < 2^39, no int64 overflow
POLY_BASE = 131


def _printable(text: Column | str) -> Column:
    """Printable-ASCII projection with a single-space fallback for
    empty results — keeps downstream per-char folds total and keeps
    the DuckDB twin byte-for-byte identical (ASCII ⇒ chars == bytes)."""
    c = F.col(text) if isinstance(text, str) else text
    clean = F.regexp_replace(F.coalesce(c, F.lit("")), r"[^\x20-\x7e]", "")
    return F.when(F.length(clean) == 0, F.lit(" ")).otherwise(clean)


def polynomial_fingerprint(text: Column | str) -> Column:
    """Engine-agnostic rolling content fingerprint (north star):
    fold (acc·131 + codepoint) mod (2³¹−1) over the printable-ASCII
    projection. Pure codegen'd higher-order functions — the
    cross-engine twin of doc_fingerprint (whose xxhash64 is
    Spark-specific and therefore rows-only in the gate)."""
    clean = _printable(text)
    # split-to-chars, NOT substring(clean, i, 1) inside the lambda:
    # Catalyst inlines the whole cleaning expression into the lambda
    # body, so an index-based fold re-runs the regexp per character
    # (O(n²) — measured 15 s vs 0.3 s on the sf0.1 corpus). The char
    # array evaluates the cleaning exactly once.
    codes = F.transform(F.split(clean, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * POLY_BASE + x) % POLY_MOD,
    )


def winnowing_fingerprints(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every k-gram of tokens (k=3), slide a
    window of w=4 grams, keep each window's minimum hash; the distinct
    minima are the fingerprint set. Guarantees: any shared run of
    ≥ k+w−1 tokens between two docs shares ≥1 fingerprint.

    Everything is per-row array lambdas (token hash → k-gram hash →
    windowed min → distinct): zero shuffle, embarrassingly parallel,
    exactly what a 100 TB fingerprint pass needs. Output is one row
    per doc with (count, min, sum) of the fingerprint set — compact
    and hash-checkable; the full set explodes trivially when a
    downstream index wants it.

    Docs with < k tokens have no k-gram and are excluded (same filter
    in the oracle)."""
    toks = tokens(F.lower(F.col(text_col)))
    d = fan_out(documents, id_col).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 3)
    th = F.transform(
        F.col("toks"),
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * POLY_BASE + F.coalesce(F.ascii(c), F.lit(0)))
            % POLY_MOD,
        ),
    )
    d = d.select(id_col, th.alias("th"), F.size("toks").alias("m"))
    # k-gram hashes: g[j] over tokens j..j+2 (1-based), j = 1..m-2
    grams = F.transform(
        F.sequence(F.lit(1), F.col("m") - 2),
        lambda j: (
            (
                (F.element_at("th", j) * POLY_BASE + F.element_at("th", j + F.lit(1)))
                % POLY_MOD
            )
            * POLY_BASE
            + F.element_at("th", j + F.lit(2))
        )
        % POLY_MOD,
    )
    d = d.select(id_col, grams.alias("g"))
    # windows of w=4 grams (slice clamps at the end, matching DuckDB's
    # inclusive-slice clamping): window i covers g[i..i+3]
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("g") - 3, F.lit(1))),
        lambda i: F.array_min(F.slice("g", i, F.lit(4))),
    )
    fps = F.array_distinct(mins)
    return d.select(
        id_col,
        F.size(fps).cast("long").alias("n_fps"),
        F.array_min(fps).alias("fp_min"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda a, x: a + x).alias("fp_sum"),
    )


def pmi_collocations(
    documents: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Collocation mining: rank adjacent word pairs by an integer lift
    score — observed bigram count over the independence expectation,
    lift_q = (c_ab · N_bigrams · 1000) DIV (c_a · c_b). The log-free
    PMI surrogate (monotone in PMI), same reasoning as
    tf_rarity_top_terms: ·,DIV are exact where ln() is libm-dependent.

    Envelope: c_ab·N·1000 must stay < 2⁶³ — holds through ~10¹²
    bigrams with hot pairs ≤ 10⁶ (far beyond 100 TB of text after the
    min_count cut); the unigram side is vocabulary-sized and
    broadcast.

    Plan: one (a,b) count shuffle + one vocab count shuffle; the
    vocab joins broadcast back. Top-k is a single TakeOrdered."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) and materialize the token arrays once (lazy
    # localCheckpoint): d feeds BOTH the bigram count and the unigram
    # count — without the cut the corpus is scanned+tokenized twice
    from ..ext.lineage import truncate_lineage

    d = fan_out(documents.filter(F.trim(F.col(text_col)) != "")).select(
        toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    d = truncate_lineage(d, eager=False)
    pairs = d.select(F.explode(adjacent_pairs("toks")).alias("p")).select(
        "p.a", "p.b"
    ).filter((F.col("a") != "") & (F.col("b") != ""))
    c_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    n_big = c_ab.agg(F.sum("n_ab").alias("n_bigrams"))
    uni = (
        d.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    scored = (
        c_ab.filter(F.col("n_ab") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("w", "a").withColumnRenamed("c_w", "c_a")), "a")
        .join(F.broadcast(uni.withColumnRenamed("w", "b").withColumnRenamed("c_w", "c_b")), "b")
        .crossJoin(F.broadcast(n_big))
        .select(
            "a",
            "b",
            "n_ab",
            F.expr("(n_ab * n_bigrams * 1000) DIV (c_a * c_b)").alias("lift_q"),
        )
    )
    return scored.orderBy(F.desc("lift_q"), "a", "b").limit(top_n)


def token_diversity(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc lexical diversity via the Gini–Simpson index,
    integer-quantized: simpson_q = (N² − Σnᵢ²)·10⁶ DIV N² where nᵢ are
    token counts. The log-free twin of token entropy (same ordering on
    the repetition axis) — a standard corpus-quality signal; boilerplate
    and keyword-stuffed docs score near 0, diverse prose near 10⁶.

    N ≤ tokens-per-doc so N²·10⁶ ≪ 2⁶³ for any realistic document.
    One (doc, word) count shuffle then a per-doc agg — the same
    two-level shape as tf_rarity_top_terms."""
    toks = tokens(F.lower(F.col(text_col)))
    counts = (
        fan_out(documents, id_col)
        .select(F.col(id_col), F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("n_i").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("n_i") * F.col("n_i")).alias("ssq"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            F.expr(
                "((n_tokens * n_tokens - ssq) * 1000000)"
                " DIV (n_tokens * n_tokens)"
            ).alias("simpson_q"),
        )
    )


def bigram_rarity_scores(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LM-lite fluency/novelty scoring: mean inverse corpus frequency
    of the doc's adjacent bigrams, rarity_q = (Σ 10⁶ DIV c_ab) DIV n —
    the integer surrogate for n-gram-LM perplexity filtering (docs of
    common constructions score low, line noise scores high). Same
    log-free reasoning as tf_rarity_top_terms/pmi_collocations.

    Plan: one (a,b) corpus count (vocabulary-sized after partial agg,
    broadcast back onto the doc bigrams), one per-doc mean. Docs with
    < 2 tokens have no bigram and are excluded (same in the oracle)."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) and materialize the exploded bigrams once
    # (lazy localCheckpoint): pairs feeds the corpus count AND the
    # scored join — one tokenize pass instead of two
    from ..ext.lineage import truncate_lineage

    d = fan_out(documents, id_col).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    pairs = d.select(
        id_col, F.explode(adjacent_pairs("toks")).alias("p")
    ).select(id_col, "p.a", "p.b").filter((F.col("a") != "") & (F.col("b") != ""))
    pairs = truncate_lineage(pairs, eager=False)
    corpus = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    scored = pairs.join(F.broadcast(corpus), ["a", "b"]).select(
        id_col, F.expr("1000000 DIV c_ab").alias("inv_q")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("SUM(inv_q) DIV COUNT(1)").alias("rarity_q"),
        )
    )


def oov_rate(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Tokenizer-coverage signal: per-doc share of tokens OUTSIDE the
    corpus top-`vocab_size` vocabulary, in ppm. High OOV rate marks
    docs a fixed-vocab tokenizer will shred into bytes — a standard
    pre-training filter axis.

    The vocabulary is the top-K by (count DESC, word ASC) — a total
    order, so the cut is deterministic. One corpus count (broadcast
    back), one per-doc mean; the fact table never reshuffles."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) + one materialized tokenize pass (words
    # feeds the vocab count AND the flagged join)
    from ..ext.lineage import truncate_lineage

    words = fan_out(documents, id_col).select(
        F.col(id_col), F.explode(toks).alias("w")
    ).filter(F.col("w") != "")
    words = truncate_lineage(words, eager=False)
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    flagged = words.join(F.broadcast(vocab), "w", "left").select(
        id_col, F.coalesce("in_vocab", F.lit(0)).alias("in_vocab")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.expr(
            "SUM(CAST(1 - in_vocab AS BIGINT)) * 1000000 DIV COUNT(1)"
        ).alias("oov_ppm"),
    )


# --- n-gram LM perplexity (r10) ----------------------------------------------

LM_FRAC_BITS = 16  # fixed-point fractional bits of the log2 costs


def _log2_q16_sql(n_expr: str, d_expr: str) -> str:
    """Spark SQL for floor-ish(2¹⁶·log₂(n/d)) with n ≥ d ≥ 1, in PURE
    int64/decimal arithmetic — no libm:

      * integer part e: bit-length difference via length(bin(x))
        (exact — a string length, not a float log), minus one when
        d·2^e0 overshoots n;
      * fractional part: the classic shift-and-square bit recurrence
        on a Q29 fixed-point mantissa x ∈ [2^29, 2^30): square
        (x² < 2^60, inside int64), renormalize, emit one bit — 16
        rounds; each truncation is a deterministic floor, so every
        engine that runs the same recurrence gets the same bits.

    Deterministic-not-exact: each round floors at 29 fractional
    bits, so the result can sit a few ulps (≈2⁻¹³ bits) below the
    true log — identically on every engine, which is the contract
    that matters for the cross-engine hash gate."""
    e0 = f"(length(bin({n_expr})) - length(bin({d_expr})))"
    e = (
        f"({e0} - (CASE WHEN shiftleft({d_expr}, CAST({e0} AS INT))"
        f" > {n_expr} THEN 1 ELSE 0 END))"
    )
    x0 = (
        f"CAST(CAST({n_expr} AS DECIMAL(38,0)) * 536870912"
        f" DIV (CAST({d_expr} AS DECIMAL(38,0))"
        f" * CAST(shiftleft(CAST(1 AS BIGINT), CAST({e} AS INT))"
        f" AS DECIMAL(38,0))) AS BIGINT)"
    )
    # r10 (guide §4.1/§1.2 per-task work): the fold state is ONE
    # BIGINT — acc·2³¹ + x (x ∈ [2²⁹, 2³⁰) by construction, acc < 2¹⁷)
    # — instead of a struct(x, acc). Higher-order lambdas run
    # interpreted per element; the struct version allocates an
    # InternalRow per round per row, the packed version is pure int64
    # arithmetic (measured ~25-30% faster on 600 k rows, outputs
    # bit-identical — tests/test_text_quality.py pins old == new).
    frac = (
        f"shiftright(aggregate(sequence(1, {LM_FRAC_BITS}), {x0}, "
        "(s, j) -> CASE WHEN shiftright((s % 2147483648) * (s % 2147483648), 29)"
        " >= 1073741824 "
        "THEN (shiftright(s, 31) * 2 + 1) * 2147483648"
        " + shiftright(shiftright((s % 2147483648) * (s % 2147483648), 29), 1) "
        "ELSE shiftright(s, 31) * 2 * 2147483648"
        " + shiftright((s % 2147483648) * (s % 2147483648), 29) END"
        f"), 31)"
    )
    return f"(CAST({e} AS BIGINT) * 65536 + {frac})"


def lm_perplexity_scores(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: int = 1,
) -> DataFrame:
    """Bigram-LM document scoring — the CCNet/KenLM corpus quality
    filter: train an add-k-smoothed bigram model on the corpus and
    score every document by its cross-entropy under that model,

        P(b | a) = (c(a,b) + k) / (c(a) + k·V)
        xent     = −(1/n) Σ log₂ P  (bits per bigram)

    entirely in exact fixed point (Q16 bits; see _log2_q16_sql — the
    engine's no-libm discipline), so the scores carry a DuckDB oracle
    twin. Perplexity = 2^xent is monotone in xent; filters threshold
    the log domain directly (as CCNet does), so no exp is ever taken.

    Output per doc: (id, n_bigrams, nll_q16, xent_q16) — total and
    per-bigram cost in 2⁻¹⁶-bit units; high xent = the model finds
    the doc surprising (line noise, boilerplate soup), low = fluent
    under the corpus's own statistics.

    Plan shape: the expensive frames are one fact-scale bigram
    explode and one (a,b) count; the 16-round log recurrence runs on
    the DISTINCT-bigram model table (vocabulary-sized, broadcast back
    onto the doc bigrams), never on the fact table. Docs with < 2
    tokens have no bigram and are excluded (same in the oracle)."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) and materialize the exploded bigrams once
    # (lazy localCheckpoint): pairs feeds the model counts, the vocab
    # count AND the scoring join — one tokenize pass instead of three
    from ..ext.lineage import truncate_lineage

    d = fan_out(documents, id_col).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    pairs = (
        d.select(id_col, F.explode(adjacent_pairs("toks")).alias("p"))
        .select(id_col, "p.a", "p.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    pairs = truncate_lineage(pairs, eager=False)
    # r10 (guide §2.4 share-one-exchange + §2.5): after the fact-scale
    # (a,b) count, re-key the vocabulary-sized bigram table by "a"
    # with ONE explicit cluster-width exchange — the c_a rollup and
    # the model join below then inherit the clustering (no further
    # exchange), and the 16-round log recurrence runs on a stage
    # AQE's size-based coalescing cannot collapse to one task (the
    # model table is a few MB; the fold cost is per-ROW, not
    # per-byte). Net plan: 3 ENSURE_REQUIREMENTS exchanges → 2.
    c_ab = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .repartition(
            pairs.sparkSession.sparkContext.defaultParallelism, "a"
        )
    )
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = (
        pairs.select("a")
        .unionByName(pairs.select(F.col("b").alias("a")))
        .agg(F.count_distinct("a").cast("long").alias("__V"))
    )
    model = (
        c_ab.join(c_a, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            (F.col("c_a") + F.lit(add_k) * F.col("__V")).alias("__n"),
            (F.col("c_ab") + F.lit(add_k)).alias("__d"),
        )
        .select(
            "a",
            "b",
            F.expr(_log2_q16_sql("__n", "__d")).alias("cost_q16"),
        )
    )
    return (
        pairs.join(F.broadcast(model), ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("cost_q16").cast("long").alias("nll_q16"),
            F.expr("SUM(cost_q16) DIV COUNT(1)")
            .cast("long")
            .alias("xent_q16"),
        )
    )


def lm_perplexity_oracle_sql(add_k: int = 1) -> str:
    """DuckDB twin of lm_perplexity_scores over `documents`: the same
    tokenization as the bigram_rarity oracle, the same add-k model,
    and the 16-round shift-and-square log recurrence UNROLLED as
    chained CTEs (the pq_rerank_oracle_sql technique) — bit-for-bit
    the arithmetic of _log2_q16_sql (DuckDB `x << e`/`>>`/HUGEINT
    stand in for Spark shiftleft/shiftright/DECIMAL(38,0))."""
    steps = []
    for i in range(1, LM_FRAC_BITS + 1):
        steps.append(
            f""", s{i} AS (
            SELECT a, b, e,
                   CASE WHEN ((x * x) >> 29) >= 1073741824
                        THEN ((x * x) >> 29) >> 1
                        ELSE ((x * x) >> 29) END AS x,
                   acc * 2 + CASE WHEN ((x * x) >> 29) >= 1073741824
                                  THEN 1 ELSE 0 END AS acc
            FROM s{i - 1}
        )"""
        )
    return (
        r"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        ), p AS (
            SELECT doc_id, toks[i] AS a, toks[i+1] AS b
            FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
            WHERE toks[i] <> '' AND toks[i+1] <> ''
        ), c AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM p GROUP BY a, b
        ), ca AS (
            SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM c GROUP BY a
        ), v AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
            FROM (SELECT a AS w FROM p UNION ALL SELECT b AS w FROM p)
        ), mdl AS (
"""
        + f"""            SELECT c.a, c.b,
                   c_a + {add_k} * v.vsz AS n,
                   c_ab + {add_k} AS d
            FROM c JOIN ca USING (a) CROSS JOIN v
        ), me AS (
            SELECT a, b, n, d,
                   (length(bin(n)) - length(bin(d)))
                   - CASE WHEN (d << (length(bin(n)) - length(bin(d))))
                               > n
                          THEN 1 ELSE 0 END AS e
            FROM mdl
        ), s0 AS (
            SELECT a, b, e,
                   CAST(CAST(n AS HUGEINT) * 536870912
                        // (CAST(d AS HUGEINT)
                            * (CAST(1 AS BIGINT) << e))
                        AS BIGINT) AS x,
                   CAST(0 AS BIGINT) AS acc
            FROM me
        )"""
        + "".join(steps)
        + f""", cost AS (
            SELECT a, b,
                   CAST(e AS BIGINT) * 65536 + acc AS cost_q16
            FROM s{LM_FRAC_BITS}
        )
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(cost_q16) AS BIGINT) AS nll_q16,
               CAST(CAST(SUM(cost_q16) AS BIGINT) // COUNT(*)
                    AS BIGINT) AS xent_q16
        FROM p JOIN cost USING (a, b)
        GROUP BY p.doc_id ORDER BY p.doc_id
        """
    )


def lm_bigram_kl(
    documents: DataFrame,
    group_expr,
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """Corpus drift between two document slices as the KL divergence
    of their add-k bigram LMs (both directions) — the distribution-
    shift gate a training-data pipeline runs when a new source lands:
    "does source B speak the same language as source A", in bits per
    bigram rather than a scalarless score.

        KL(A‖B) = (1/N_A) Σ_ab c_A(ab)·(cost_B(ab) − cost_A(ab))

    with cost_M the Q16 −log₂P under model M (the lm_perplexity
    machinery) evaluated on the UNION bigram space with a SHARED
    vocabulary (V = distinct tokens over both slices), so Q always
    covers P's support and KL is finite. All exact fixed point —
    products accumulate in DECIMAL(38,0), one DIV; deterministic
    cross-engine (4-ulp Q16 truncation means a mathematically ~0 KL
    can land a hair under 0 — identically on both engines).

    ``group_expr``: boolean Column splitting docs into slice A (true)
    and B (false). Output: one row (n_bigrams_a, n_bigrams_b,
    vocab_union, kl_ab_q16, kl_ba_q16).

    Plan: one fact-scale bigram explode; everything after runs on the
    union-bigram model table (vocabulary-sized), where both models'
    costs are computed side by side — the 16-round recurrence never
    touches the fact table."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) + one materialized tokenize pass (pairs
    # feeds both the per-slice counts and the union vocab count)
    from ..ext.lineage import truncate_lineage

    d = fan_out(documents).select(
        group_expr.cast("boolean").alias("__g"), toks.alias("toks")
    ).filter(F.col("__g").isNotNull() & (F.size("toks") >= 2))
    pairs = (
        d.select("__g", F.explode(adjacent_pairs("toks")).alias("p"))
        .select("__g", "p.a", "p.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    pairs = truncate_lineage(pairs, eager=False)
    cab = pairs.groupBy("__g", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    # union model table: both slices' bigram and first-token counts.
    # r10: one explicit cluster-width re-key by "a" (the
    # lm_perplexity_scores idiom) — the firsts rollup and the model
    # join inherit the clustering, and the TWO 16-round recurrences
    # below run wide instead of on one AQE-coalesced task.
    wide = (
        cab.groupBy("a", "b")
        .agg(
            F.sum(F.when(F.col("__g"), F.col("c_ab"))).alias("ca_ab"),
            F.sum(F.when(~F.col("__g"), F.col("c_ab"))).alias("cb_ab"),
        )
        .fillna({"ca_ab": 0, "cb_ab": 0})
        .repartition(
            pairs.sparkSession.sparkContext.defaultParallelism, "a"
        )
    )
    firsts = wide.groupBy("a").agg(
        F.sum("ca_ab").alias("ca_a"), F.sum("cb_ab").alias("cb_a")
    )
    vocab = (
        pairs.select("a")
        .unionByName(pairs.select(F.col("b").alias("a")))
        .agg(F.count_distinct("a").cast("long").alias("__V"))
    )
    model = (
        wide.join(firsts, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            "ca_ab",
            "cb_ab",
            (F.col("ca_a") + F.lit(add_k) * F.col("__V")).alias("__na"),
            (F.col("ca_ab") + F.lit(add_k)).alias("__da"),
            (F.col("cb_a") + F.lit(add_k) * F.col("__V")).alias("__nb"),
            (F.col("cb_ab") + F.lit(add_k)).alias("__db"),
            "__V",
        )
        .select(
            "ca_ab",
            "cb_ab",
            "__V",
            F.expr(_log2_q16_sql("__na", "__da")).alias("__cost_a"),
            F.expr(_log2_q16_sql("__nb", "__db")).alias("__cost_b"),
        )
    )
    dec = "decimal(38,0)"
    return model.agg(
        F.sum("ca_ab").cast("long").alias("n_bigrams_a"),
        F.sum("cb_ab").cast("long").alias("n_bigrams_b"),
        F.first("__V").alias("vocab_union"),
        F.expr(
            f"CAST(SUM(CAST(ca_ab AS {dec})"
            f" * (__cost_b - __cost_a))"
            " DIV SUM(ca_ab) AS BIGINT)"
        ).alias("kl_ab_q16"),
        F.expr(
            f"CAST(SUM(CAST(cb_ab AS {dec})"
            f" * (__cost_a - __cost_b))"
            " DIV SUM(cb_ab) AS BIGINT)"
        ).alias("kl_ba_q16"),
    )


def lm_kl_oracle_sql(group_sql: str, add_k: int = 1) -> str:
    """DuckDB twin of lm_bigram_kl: `group_sql` is the boolean slice
    expression over `documents`; ONE 16-round recurrence chain runs
    over the stacked (model, bigram) rows — both models' costs in the
    same unroll, re-pivoted for the weighted sums."""
    steps = []
    for i in range(1, LM_FRAC_BITS + 1):
        steps.append(
            f""", s{i} AS (
            SELECT m, a, b, e,
                   CASE WHEN ((x * x) >> 29) >= 1073741824
                        THEN ((x * x) >> 29) >> 1
                        ELSE ((x * x) >> 29) END AS x,
                   acc * 2 + CASE WHEN ((x * x) >> 29) >= 1073741824
                                  THEN 1 ELSE 0 END AS acc
            FROM s{i - 1}
        )"""
        )
    return (
        rf"""
        WITH t AS (
            SELECT CAST(({group_sql}) AS BOOLEAN) AS g,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE ({group_sql}) IS NOT NULL
              AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        ), p AS (
            SELECT g, toks[i] AS a, toks[i+1] AS b
            FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
            WHERE toks[i] <> '' AND toks[i+1] <> ''
        ), wide AS (
            SELECT a, b,
                   CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT)
                       AS ca_ab,
                   CAST(SUM(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT)
                       AS cb_ab
            FROM p GROUP BY a, b
        ), firsts AS (
            SELECT a, CAST(SUM(ca_ab) AS BIGINT) AS ca_a,
                   CAST(SUM(cb_ab) AS BIGINT) AS cb_a
            FROM wide GROUP BY a
        ), v AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
            FROM (SELECT a AS w FROM p UNION ALL SELECT b AS w FROM p)
        ), stacked AS (
            SELECT 'A' AS m, w.a, w.b,
                   f.ca_a + {add_k} * v.vsz AS n, w.ca_ab + {add_k} AS d
            FROM wide w JOIN firsts f USING (a) CROSS JOIN v
            UNION ALL
            SELECT 'B' AS m, w.a, w.b,
                   f.cb_a + {add_k} * v.vsz AS n, w.cb_ab + {add_k} AS d
            FROM wide w JOIN firsts f USING (a) CROSS JOIN v
        ), me AS (
            SELECT m, a, b, n, d,
                   (length(bin(n)) - length(bin(d)))
                   - CASE WHEN (d << (length(bin(n)) - length(bin(d))))
                               > n
                          THEN 1 ELSE 0 END AS e
            FROM stacked
        ), s0 AS (
            SELECT m, a, b, e,
                   CAST(CAST(n AS HUGEINT) * 536870912
                        // (CAST(d AS HUGEINT)
                            * (CAST(1 AS BIGINT) << e))
                        AS BIGINT) AS x,
                   CAST(0 AS BIGINT) AS acc
            FROM me
        )"""
        + "".join(steps)
        + f""", cost AS (
            SELECT m, a, b,
                   CAST(e AS BIGINT) * 65536 + acc AS c
            FROM s{LM_FRAC_BITS}
        ), piv AS (
            SELECT w.ca_ab, w.cb_ab,
                   ca.c AS cost_a, cb.c AS cost_b
            FROM wide w
            JOIN cost ca ON ca.m = 'A' AND ca.a = w.a AND ca.b = w.b
            JOIN cost cb ON cb.m = 'B' AND cb.a = w.a AND cb.b = w.b
        )
        SELECT CAST(SUM(ca_ab) AS BIGINT) AS n_bigrams_a,
               CAST(SUM(cb_ab) AS BIGINT) AS n_bigrams_b,
               (SELECT vsz FROM v) AS vocab_union,
               CAST(SUM(CAST(ca_ab AS HUGEINT) * (cost_b - cost_a))
                    // SUM(ca_ab) AS BIGINT) AS kl_ab_q16,
               CAST(SUM(CAST(cb_ab AS HUGEINT) * (cost_a - cost_b))
                    // SUM(cb_ab) AS BIGINT) AS kl_ba_q16
        FROM piv
        """
    )


# --- fixed-point exp2 + mixture temperature plan (r10) -----------------------

# C_j = floor(2^(2^(j-16)) · 2^30): the Q30 multiplier contributed by
# bit j of a Q16 fractional exponent. HARDCODED literals shared with
# the oracle twin (the _HLL_ALPHA_PPM discipline: no libm evaluation
# anywhere near a hash-checked output).
_EXP2_Q30_BITS = (
    1073753180, 1073764537, 1073787251, 1073832680,
    1073923543, 1074105294, 1074468887, 1075196443,
    1076653033, 1079572135, 1085434105, 1097253708,
    1121280435, 1170923761, 1276901416, 1518500249,
)


def _exp2_q30_sql(f_expr: str) -> str:
    """Spark SQL for floor-ish(2^(f/2¹⁶) · 2³⁰), f ≥ 0 in Q16 —
    the inverse of _log2_q16_sql, same no-libm discipline: integer
    part is a left shift, fractional part is a product of the
    hardcoded per-bit constants (x·C_j >> 30 per set bit — 16
    truncating multiply-shifts; x < 2³¹ and C_j < 2³¹ keep every
    product inside int64). Deterministic identically cross-engine."""
    e = f"(({f_expr}) DIV 65536)"
    frac = f"pmod({f_expr}, 65536)"
    steps = f"""aggregate(sequence(0, 15),
        struct(CAST(1073741824 AS BIGINT) AS x, {frac} AS fr),
        (s, j) -> struct(
            CASE WHEN pmod(shiftright(s.fr, j), 2) = 1
                 THEN shiftright(
                     s.x * element_at(array({', '.join(f'{c}L' for c in _EXP2_Q30_BITS)}), j + 1),
                     30)
                 ELSE s.x END AS x,
            s.fr AS fr)
    ).x"""
    return f"shiftleft({steps}, CAST({e} AS INT))"


def mixture_temperature_plan(
    documents: DataFrame,
    source_col: str = "lang",
    alpha_ppm: int = 300_000,
    text_col: str = "text",
) -> DataFrame:
    """α-temperature source reweighting — the multilingual /
    multi-source mixture rule (XLM-R / mBERT: p_i ∝ n_i^α with
    α ≈ 0.3) that upsamples small sources and damps dominant ones,
    computed entirely in fixed point so the PLAN hash-checks:

        w_i       = 2^(α·log₂ n_tokens_i)      (Q30, no libm)
        weight_ppm = w_i·10⁶ DIV Σw            (the target mixture)
        rate_ppm   = 10⁶·(w_i·n_m) DIV (w_m·n_i)  (per-source
                     sampling rate, normalized so the most
                     upsampled source m reads at 10⁶ — sources are
                     downsampled relative to it, never repeated)

    m = argmax w_j/n_j via a quantized-DIV ordering key with a
    source tie-break (the engine's deterministic-argmax idiom).
    One fact-scale aggregate; everything after runs on the bounded
    source table. Sources with zero tokens are excluded."""
    toks = tokens(F.lower(F.col(text_col)))
    per_src = (
        documents.filter(F.col(source_col).isNotNull())
        .select(
            F.col(source_col).alias("source"),
            F.size(F.filter(toks, lambda t: t != "")).alias("__nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 1)
    )
    f = (
        f"(({_log2_q16_sql('n_tokens', '1')})"
        f" * {alpha_ppm} DIV 1000000)"
    )
    weighted = per_src.withColumn("__w", F.expr(_exp2_q30_sql(f)))
    # argmax of w/n via quantized key (w·2^20 DIV n), ties to the
    # lexicographically smallest source — deterministic cross-engine
    m = weighted.select(
        F.expr(
            "min_by(struct(__w AS wm, n_tokens AS nm), "
            "struct(-(CAST(__w AS DECIMAL(38,0)) * 1048576"
            " DIV n_tokens) AS k, source AS s))"
        ).alias("__m"),
        F.sum(F.col("__w").cast("decimal(38,0)")).alias("__sw"),
    )
    dec = "decimal(38,0)"
    return (
        weighted.crossJoin(F.broadcast(m))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                f"CAST(CAST(__w AS {dec}) * 1000000 DIV __sw"
                " AS BIGINT)"
            ).alias("weight_ppm"),
            F.expr(
                f"CAST(CAST(__w AS {dec}) * __m.nm * 1000000"
                f" DIV (CAST(__m.wm AS {dec}) * n_tokens)"
                " AS BIGINT)"
            ).alias("sample_rate_ppm"),
        )
        .orderBy("source")
    )


def mixture_temperature_oracle_sql(
    source_expr: str = "lang", alpha_ppm: int = 300_000
) -> str:
    """DuckDB twin of mixture_temperature_plan over `documents`: the
    Q16 log chain (d = 1: the bit-length integer part needs no
    adjust) then the Q30 exp2 chain with the SAME hardcoded per-bit
    constants, both unrolled as chained CTEs over the bounded
    source table; argmax(w/n) via the identical quantized-DIV key
    with the source tie-break."""
    lsteps = []
    for i in range(1, LM_FRAC_BITS + 1):
        lsteps.append(
            f""", l{i} AS (
            SELECT source, n_docs, n_tokens, e,
                   CASE WHEN ((x * x) >> 29) >= 1073741824
                        THEN ((x * x) >> 29) >> 1
                        ELSE ((x * x) >> 29) END AS x,
                   acc * 2 + CASE WHEN ((x * x) >> 29) >= 1073741824
                                  THEN 1 ELSE 0 END AS acc
            FROM l{i - 1}
        )"""
        )
    xsteps = []
    for j, c in enumerate(_EXP2_Q30_BITS):
        xsteps.append(
            f""", x{j + 1} AS (
            SELECT source, n_docs, n_tokens, e2, fr,
                   CASE WHEN ((fr >> {j}) & 1) = 1
                        THEN (x * {c}) >> 30 ELSE x END AS x
            FROM x{j}
        )"""
        )
    return (
        rf"""
        WITH per AS (
            SELECT ({source_expr}) AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(
                       regexp_split_to_array(trim(lower(text)), '\s+'),
                       t -> t <> ''))) AS BIGINT) AS n_tokens
            FROM documents
            WHERE ({source_expr}) IS NOT NULL
            GROUP BY 1
            HAVING SUM(len(list_filter(
                regexp_split_to_array(trim(lower(text)), '\s+'),
                t -> t <> ''))) >= 1
        ), l0 AS (
            SELECT source, n_docs, n_tokens,
                   length(bin(n_tokens)) - 1 AS e,
                   CAST(CAST(n_tokens AS HUGEINT) * 536870912
                        // (CAST(1 AS BIGINT)
                            << (length(bin(n_tokens)) - 1))
                        AS BIGINT) AS x,
                   CAST(0 AS BIGINT) AS acc
            FROM per
        )"""
        + "".join(lsteps)
        + f""", lf AS (
            SELECT source, n_docs, n_tokens,
                   (CAST(e AS BIGINT) * 65536 + acc)
                   * {alpha_ppm} // 1000000 AS f
            FROM l{LM_FRAC_BITS}
        ), x0 AS (
            SELECT source, n_docs, n_tokens,
                   f // 65536 AS e2, f % 65536 AS fr,
                   CAST(1073741824 AS BIGINT) AS x
            FROM lf
        )"""
        + "".join(xsteps)
        + f""", w AS (
            SELECT source, n_docs, n_tokens,
                   x << e2 AS wv
            FROM x{len(_EXP2_Q30_BITS)}
        ), m AS (
            SELECT wv AS wm, n_tokens AS nm FROM w
            ORDER BY (CAST(wv AS HUGEINT) * 1048576 // n_tokens)
                     DESC, source ASC
            LIMIT 1
        ), sw AS (
            SELECT CAST(SUM(CAST(wv AS HUGEINT)) AS HUGEINT) AS s
            FROM w
        )
        SELECT w.source, w.n_docs, w.n_tokens,
               CAST(CAST(wv AS HUGEINT) * 1000000 // sw.s AS BIGINT)
                   AS weight_ppm,
               CAST(CAST(wv AS HUGEINT) * m.nm * 1000000
                    // (CAST(m.wm AS HUGEINT) * w.n_tokens)
                    AS BIGINT) AS sample_rate_ppm
        FROM w CROSS JOIN m CROSS JOIN sw
        ORDER BY w.source
        """
    )


def lm_crossentropy_heldout(
    documents: DataFrame,
    train_expr,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: int = 1,
) -> DataFrame:
    """Held-out LM scoring — the exact CCNet shape: the bigram model
    trains ONLY on the TRAIN slice (``train_expr`` true), and every
    HELD-OUT document (``train_expr`` false) is scored under it.
    Unlike ``lm_perplexity_scores`` (self-scoring, where every scored
    bigram was seen in training), held-out bigrams may be UNSEEN —
    they cost the full smoothed penalty −log₂(k/(c_a + k·V)) (or
    −log₂(k/(k·V)) for an unseen first token), which is what makes
    the score a real out-of-distribution signal.

    Vocabulary V = distinct tokens of the TRAIN slice only (the
    model's vocabulary; held-out tokens outside it are exactly the
    OOV events the smoothing prices). Output per held-out doc:
    (id, n_bigrams, nll_q16, xent_q16), Q16 bits — same schema as
    the self-scoring variant, filterable by the same thresholds.

    Plan: train-side counts as in lm_perplexity_scores; the held-out
    DISTINCT bigram set left-joins the model (zero-filled), the Q16
    recurrence runs once per distinct held-out bigram, then
    broadcasts back onto the held-out fact rows."""
    toks = tokens(F.lower(F.col(text_col)))
    # fan out (guide §2.5) + one materialized tokenize pass (pairs
    # feeds the train counts, the vocab count AND the held-out side)
    from ..ext.lineage import truncate_lineage

    base = fan_out(documents, id_col).select(
        F.col(id_col),
        train_expr.cast("boolean").alias("__train"),
        toks.alias("toks"),
    ).filter(F.col("__train").isNotNull() & (F.size("toks") >= 2))
    pairs = (
        base.select(
            id_col,
            "__train",
            F.explode(adjacent_pairs("toks")).alias("p"),
        )
        .select(id_col, "__train", "p.a", "p.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    pairs = truncate_lineage(pairs, eager=False)
    train = pairs.filter(F.col("__train"))
    held = pairs.filter(~F.col("__train"))
    c_ab = train.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = (
        train.select("a")
        .unionByName(train.select(F.col("b").alias("a")))
        .agg(F.count_distinct("a").cast("long").alias("__V"))
    )
    held_bigrams = held.select("a", "b").distinct()
    # r10: explicit cluster-width re-key by "a" between the two model
    # joins (the lm_perplexity_scores idiom) so the c_a join inherits
    # the clustering and the 16-round recurrence below runs wide
    # instead of on one AQE-coalesced task.
    model = (
        held_bigrams.join(c_ab, ["a", "b"], "left")
        .repartition(
            pairs.sparkSession.sparkContext.defaultParallelism, "a"
        )
        .join(c_a, "a", "left")
        .fillna({"c_ab": 0, "c_a": 0})
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            (F.col("c_a") + F.lit(add_k) * F.col("__V")).alias("__n"),
            (F.col("c_ab") + F.lit(add_k)).alias("__d"),
        )
        .select(
            "a",
            "b",
            F.expr(_log2_q16_sql("__n", "__d")).alias("cost_q16"),
        )
    )
    return (
        held.join(F.broadcast(model), ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("cost_q16").cast("long").alias("nll_q16"),
            F.expr("SUM(cost_q16) DIV COUNT(1)")
            .cast("long")
            .alias("xent_q16"),
        )
    )


def lm_heldout_oracle_sql(train_sql: str, add_k: int = 1) -> str:
    """DuckDB twin of lm_crossentropy_heldout: train-slice model,
    held-out distinct-bigram costs (zero-filled left joins), one
    16-round recurrence chain."""
    steps = []
    for i in range(1, LM_FRAC_BITS + 1):
        steps.append(
            f""", s{i} AS (
            SELECT a, b, e,
                   CASE WHEN ((x * x) >> 29) >= 1073741824
                        THEN ((x * x) >> 29) >> 1
                        ELSE ((x * x) >> 29) END AS x,
                   acc * 2 + CASE WHEN ((x * x) >> 29) >= 1073741824
                                  THEN 1 ELSE 0 END AS acc
            FROM s{i - 1}
        )"""
        )
    return (
        rf"""
        WITH t AS (
            SELECT doc_id, CAST(({train_sql}) AS BOOLEAN) AS tr,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE ({train_sql}) IS NOT NULL
              AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        ), p AS (
            SELECT doc_id, tr, toks[i] AS a, toks[i+1] AS b
            FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
            WHERE toks[i] <> '' AND toks[i+1] <> ''
        ), c AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM p WHERE tr GROUP BY a, b
        ), ca AS (
            SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM c GROUP BY a
        ), v AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
            FROM (SELECT a AS w FROM p WHERE tr
                  UNION ALL SELECT b AS w FROM p WHERE tr)
        ), hb AS (
            SELECT DISTINCT a, b FROM p WHERE NOT tr
        ), mdl AS (
            SELECT hb.a, hb.b,
                   COALESCE(ca.c_a, 0) + {add_k} * v.vsz AS n,
                   COALESCE(c.c_ab, 0) + {add_k} AS d
            FROM hb
            LEFT JOIN c ON c.a = hb.a AND c.b = hb.b
            LEFT JOIN ca ON ca.a = hb.a
            CROSS JOIN v
        ), me AS (
            SELECT a, b, n, d,
                   (length(bin(n)) - length(bin(d)))
                   - CASE WHEN (d << (length(bin(n)) - length(bin(d))))
                               > n
                          THEN 1 ELSE 0 END AS e
            FROM mdl
        ), s0 AS (
            SELECT a, b, e,
                   CAST(CAST(n AS HUGEINT) * 536870912
                        // (CAST(d AS HUGEINT)
                            * (CAST(1 AS BIGINT) << e))
                        AS BIGINT) AS x,
                   CAST(0 AS BIGINT) AS acc
            FROM me
        )"""
        + "".join(steps)
        + f""", cost AS (
            SELECT a, b,
                   CAST(e AS BIGINT) * 65536 + acc AS cost_q16
            FROM s{LM_FRAC_BITS}
        )
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(cost_q16) AS BIGINT) AS nll_q16,
               CAST(CAST(SUM(cost_q16) AS BIGINT) // COUNT(*)
                    AS BIGINT) AS xent_q16
        FROM p JOIN cost USING (a, b)
        WHERE NOT p.tr
        GROUP BY p.doc_id ORDER BY p.doc_id
        """
    )
