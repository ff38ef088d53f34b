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


def word_frequencies(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 — corpus word frequencies: lower→split→explode→count.

    The explode is map-side (no shuffle until the count agg, which is
    partial-aggregated); at 100 TB the hot keys (stopwords) are
    exactly the keys partial aggregation collapses best.
    """
    return (
        documents.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
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
    toks = documents.select(
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


def bigram_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 — corpus bigram frequencies via an array-lambda transform
    (no self-join): token array → adjacent-pair strings → explode →
    count. All JVM-side higher-order functions."""
    toks = (
        documents.filter(F.trim(F.col(text_col)) != "")
        .select(tokens(F.lower(F.col(text_col))).alias("toks"))
        # single-token docs: sequence(1, 0) counts DOWN in Spark — gate it
        .filter(F.size("toks") >= 2)
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i-1], ' ', toks[i]))"
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
        documents.select(
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
        documents.select(F.col(id_col), toks.alias("__toks"))
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
