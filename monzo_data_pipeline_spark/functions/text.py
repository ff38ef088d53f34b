"""Text-analysis functions — SURVEY.md §2.C4 and the north-star
training-data-pipeline text operators (language-ID, quality scoring,
token counting, fingerprinting) over the `documents` table.

All pure built-in column expressions (codegen, no Python UDFs) so a
100 TB corpus pays zero serialization tax: each function returns a
Column usable inside any select/groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
