"""Round-4 web-corpus curation operators.

The reference pipeline curates card transactions
(reference/src/sql/transform_bronze_to_silver.sql: dedup, cast,
default-fill); a training-data engine at 100 TB needs the text-side
equivalents of those same moves, applied corpus-wide:

- ``segment_dedup`` — CCNet-style duplicated-passage removal
  (Wenzek et al., LREC 2020): hash fixed-length token segments,
  count them corpus-wide, rebuild each document from the segments
  that are not boilerplate.
- ``hashed_quality_scores`` — fastText-style linear classifier
  inference (Joulin et al., EACL 2017): hashed bag-of-words buckets
  dotted with a fixed weight vector, entirely map-side.
- ``split_assignment`` / ``split_audit`` — leak-proof deterministic
  train/val/test assignment keyed on the document id, plus the
  per-(lang, source) share audit that catches stratification skew.
- ``phrase_match`` — positional-postings phrase search: explode
  (doc, pos, word), keep only the phrase's words, equi-join on
  (doc, pos+1).
- ``ks_drift`` — two-sample Kolmogorov–Smirnov statistic between
  two sources over a binned value column; the drift monitor run
  between ingest batches.
- ``collapse_repeats`` — consecutive-duplicate token collapse
  (the "aaaa" cleanup pass), zero-shuffle.

Everything is integer / polynomial-hash arithmetic (mod 2³¹−1, the
same engine-agnostic family as functions/text.py), so every operator
is hash-checkable against a DuckDB oracle twin — no libm, no floats,
no engine-specific hashes in any checked output.

Scale posture (100 TB): segment counting is one partial-agg'd
shuffle of (segment-hash) keys; the duplicated-segment set joins
back broadcast (duplicated passages are a tiny fraction of a real
corpus — the join degrades to a shuffle join via AQE if not).
Everything else is map-side lambdas over materialized token arrays
(see the HOF-inlining note at functions/text.py:431 — token arrays
are projected once before any lambda references them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POLY_MOD = 2_147_483_647  # 2^31 − 1; acc·131 + code stays < 2^39
POLY_BASE = 131

# Weight-vector constants for the hashed linear classifier: an LCG
# step maps bucket → pseudo-weight in [−1000, 1000]. Full-period
# multiplier (Numerical Recipes) — small structured multipliers
# measurably collapse weight diversity, the same failure mode as
# ext/dedup_fuzzy._lcg_constants.
_W_MULT = 1_103_515_245
_W_ADD = 12_345
_W_SPAN = 2_001


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def _char_fold(s: Column) -> Column:
    """(acc·131 + code) mod 2³¹−1 over a string's characters — the
    engine-agnostic hash family shared with functions/text.py."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_BASE + F.coalesce(F.ascii(c), F.lit(0)))
        % POLY_MOD,
    )


def segment_dedup(
    documents: DataFrame,
    seg_len: int = 8,
    max_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_dups: bool = True,
) -> DataFrame:
    """Corpus-wide duplicated-passage removal (CCNet / RefinedWeb
    line-dedup, generalized to fixed-length token segments).

    Each document is cut into consecutive ``seg_len``-token segments;
    a segment whose hash occurs more than ``max_count`` times across
    the corpus is boilerplate and is dropped from EVERY document.
    Output per doc: segment counts plus ``kept_fold`` — the ordered
    polynomial fold of the surviving segment hashes, which pins the
    rebuilt document (content AND order) under the oracle gate
    without shipping the rebuilt text.

    Plan: segments stay inside their document row until one
    posexplode feeds (a) the corpus count — one partial-agg'd
    shuffle on the hash key — and (b) the join back against the
    duplicated-hash set, which is broadcast (real corpora have few
    duplicated passages; set ``broadcast_dups=False`` to let AQE
    choose when the boilerplate set is itself huge). Reassembly is
    one groupBy(doc) over (idx, hash) pairs.
    """
    # r10 (guide §2.5): fan the docs out — the per-char polynomial fold
    # below is the heavy stage and single-row-group scans run it on one
    # core otherwise
    from ..operators.partitioning import fan_out

    d = (
        fan_out(documents, id_col)
        .filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), _tokens(text_col).alias("toks"))
        .select(
            id_col,
            "toks",
            F.expr(f"(size(toks) + {seg_len - 1}) DIV {seg_len}").alias("n_segs"),
        )
    )
    segs = F.transform(
        F.sequence(F.lit(0), F.col("n_segs") - 1),
        lambda j: F.array_join(
            F.slice("toks", j * seg_len + F.lit(1), seg_len), " "
        ),
    )
    d = d.select(id_col, segs.alias("segs"))
    d = d.select(id_col, F.transform("segs", _char_fold).alias("seg_h"))
    e = d.select(id_col, F.posexplode("seg_h").alias("seg_idx", "h"))
    # materialize the folded segment hashes once (lazy localCheckpoint):
    # e feeds BOTH the corpus count and the join back — without the cut
    # the per-char fold runs twice over the corpus
    from .lineage import truncate_lineage

    e = truncate_lineage(e, eager=False)

    dup = (
        e.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > max_count)
        .select("h", F.lit(True).alias("is_dup"))
    )
    if broadcast_dups:
        dup = F.broadcast(dup)

    flagged = e.join(dup, "h", "left").select(
        id_col,
        "seg_idx",
        "h",
        F.col("is_dup").isNull().alias("kept"),
    )
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_sort(
            F.collect_list(F.when(F.col("kept"), F.struct("seg_idx", "h")))
        ).alias("kept_pairs"),
    )
    fold = F.aggregate(
        F.transform("kept_pairs", lambda x: x["h"]),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * POLY_BASE + h) % POLY_MOD,
    )
    return out.select(id_col, "n_segs", "n_kept", fold.alias("kept_fold"))


def hashed_quality_scores(
    documents: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style linear quality classifier inference: each token
    hashes into one of ``n_buckets`` feature buckets; each bucket
    carries a fixed integer weight from a full-period LCG; the
    document score is the sum of its tokens' weights and the accept
    label is ``score >= 0``.

    Entirely map-side (zero shuffle): at 100 TB this is the cheap
    first-pass filter that runs ahead of any dedup or packing stage.
    A trained model drops in by replacing the LCG weight expression
    with a broadcast bucket→weight array lookup — the plan shape
    (per-token transform + per-doc fold) is unchanged.
    """
    d = documents.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), _tokens(text_col).alias("toks")
    )
    th = F.transform("toks", _char_fold)
    d = d.select(
        id_col, F.size("toks").cast("long").alias("n_tokens"), th.alias("th")
    )
    weights = F.transform(
        "th",
        lambda h: ((h % n_buckets) * _W_MULT + _W_ADD) % _W_SPAN
        - (_W_SPAN - 1) // 2,
    )
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, w: acc + w
    )
    return d.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        (score >= 0).alias("accept"),
    )


def split_assignment(
    documents: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment keyed on the document
    id: ``((id mod (2³¹−1)) · 2654435761) mod (2³¹−1) mod 100``
    (Knuth's multiplicative hash; the inner mod keeps the product
    under 2⁶³ for any int64 id) buckets every doc reproducibly
    across engines, batches, and repartitionings — the property that
    keeps the split leak-proof when the corpus is rebuilt
    incrementally. Map-side only; adds a ``split`` column."""
    # pmod, not %: Spark % keeps the dividend's sign, so a negative id
    # would land in a negative bucket (< train_pct) and every negative
    # id would silently become 'train'
    bucket = (
        F.pmod(F.col(id_col), F.lit(POLY_MOD)) * F.lit(2_654_435_761)
    ) % POLY_MOD % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.withColumn("split", split)


def split_audit(
    documents: DataFrame,
    id_col: str = "doc_id",
    strata: tuple[str, str] = ("lang", "source"),
) -> DataFrame:
    """Per-stratum split-share audit: counts and ppm share of each
    split within every (lang, source) stratum — the check that a
    deterministic hash split did not correlate with a stratum (which
    would leak distribution shift between train and eval). Two
    bounded aggs + one broadcast join; the fact table is touched
    once."""
    a, b = strata
    counts = (
        split_assignment(documents, id_col=id_col)
        .groupBy(a, b, "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = counts.groupBy(a, b).agg(F.sum("n_docs").alias("tot"))
    return (
        counts.join(F.broadcast(totals), [a, b])
        .select(
            a,
            b,
            "split",
            "n_docs",
            F.expr("(n_docs * 1000000) DIV tot").alias("share_ppm"),
        )
    )


def phrase_match(
    documents: DataFrame,
    phrase: str,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional phrase search: explode (doc, pos, token), keep only
    the phrase's two words (the selective filter runs before any
    shuffle), then equi-join first-word positions against
    second-word positions at pos+1. Top-k docs by match count with a
    unique tiebreak.

    The join key is (doc, pos) — a hash join over two already-tiny
    filtered sides; no nested-loop, no all-pairs. A standing corpus
    index materializes the exploded postings once (see
    ext/search.py::inverted_index for the incremental form) and this
    query becomes two index lookups.
    """
    w1, w2 = phrase.lower().split()
    pos = (
        documents.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), _tokens(text_col).alias("toks"))
        .select(id_col, F.posexplode("toks").alias("pos", "word"))
        .filter(F.col("word").isin(w1, w2))
    )
    a = pos.filter(F.col("word") == w1).select(id_col, "pos")
    b = pos.filter(F.col("word") == w2).select(
        F.col(id_col).alias("__id2"), (F.col("pos") - 1).alias("__pos2")
    )
    m = a.join(
        b,
        (F.col(id_col) == F.col("__id2")) & (F.col("pos") == F.col("__pos2")),
    )
    return (
        m.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy(F.desc("n_matches"), F.asc(id_col))
        .limit(k)
    )


def ks_drift(
    documents: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    group_a: str = "src0",
    group_b: str = "src1",
    bin_width: int = 16,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    groups over a binned value column: KS = max over bins of
    |CDF_a − CDF_b|, reported in ppm with the first bin achieving
    the max. The standing data-drift monitor between ingest batches
    or corpus sources.

    Plan: one partial-agg'd shuffle keyed on the bin (bin count is
    bounded by value-domain / bin_width, not by rows), then the
    whole CDF walk happens inside ONE folded row — no window
    anywhere, so nothing serializes on a single task no matter how
    many rows feed the bins. The per-bin CDF difference is computed
    in fixed-order IEEE doubles (cum·10⁶/n, identical expression
    order in the DuckDB twin — determinism technique #1 in
    COVERAGE.md), so both engines produce bit-identical diffs at any
    corpus size; only the final floor-to-ppm is integer."""
    f = documents.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.expr(f"{value_col} DIV {bin_width}").alias("bin"), F.col(group_col)
    )
    counts = f.groupBy("bin").agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias("c2"),
    )
    row = counts.agg(
        F.array_sort(F.collect_list(F.struct("bin", "c1", "c2"))).alias("bins"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("cum1"),
        F.lit(0).cast("long").alias("cum2"),
        F.lit(-1.0).alias("best"),
        F.lit(-1).cast("long").alias("bestbin"),
    )

    def step(acc, x):
        cum1 = acc["cum1"] + x["c1"]
        cum2 = acc["cum2"] + x["c2"]
        diff = F.abs(
            cum1.cast("double") * F.lit(1_000_000.0)
            / F.col("n1").cast("double")
            - cum2.cast("double") * F.lit(1_000_000.0)
            / F.col("n2").cast("double")
        )
        # strictly-greater keeps the FIRST (lowest) bin at the max —
        # bins arrive ascending from array_sort
        return F.struct(
            cum1.alias("cum1"),
            cum2.alias("cum2"),
            F.greatest(diff, acc["best"]).alias("best"),
            F.when(diff > acc["best"], x["bin"])
            .otherwise(acc["bestbin"])
            .alias("bestbin"),
        )

    folded = F.aggregate("bins", init, step)
    # a KS statistic only exists when BOTH groups have rows — a group
    # going empty (a source stops ingesting) would otherwise divide by
    # zero (Inf → garbage floor'd long); emit NULL ks_ppm/ks_bin, the
    # same degenerate-input contract as the DuckDB twin
    ok = (F.coalesce(F.col("n1"), F.lit(0)) > 0) & (
        F.coalesce(F.col("n2"), F.lit(0)) > 0
    )
    return row.select(
        F.size("bins").cast("long").alias("n_bins"),
        "n1",
        "n2",
        F.when(ok, F.floor(folded["best"]).cast("long")).alias("ks_ppm"),
        F.when(ok, folded["bestbin"]).alias("ks_bin"),
    )


def tvd_token_drift(
    documents: DataFrame,
    source_a: str,
    source_b: str,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Total-variation distance between two sources' unigram token
    distributions — the categorical companion to ``ks_drift``: where
    KS watches a numeric column's CDF, TVD answers "how differently
    do these two corpus slices SPEAK" (vocabulary-shift monitor
    between crawls / providers / snapshots).

    TVD = ½·Σ_w |p_w − q_w| ∈ [0, 1]. ALL-integer: with c1/c2 the
    per-word counts and n1/n2 the totals, Σ_w |c1_w·n2 − c2_w·n1|
    is an exact DECIMAL(38,0) sum and tvd_ppm = S·10⁶ // (2·n1·n2)
    — no libm (a KL/JS variant would put log() into a hash-checked
    output; cross-libm log is not bit-stable). Words absent from one
    source contribute their full mass, so a disjoint-vocabulary pair
    reads exactly 10⁶ ppm.

    Plan: one (word) partial-agg'd shuffle with conditional per-source
    counts, 1-row totals broadcast back, one wide aggregate. Both
    degenerate directions guarded: either source empty → NULL tvd_ppm
    (same contract as ks_drift's n1/n2 guard, mirrored in the twin)."""
    f = documents.filter(
        F.col(source_col).isin(source_a, source_b)
        & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(source_col).alias("__src"),
        F.explode(_tokens(text_col)).alias("__w"),
    ).filter(F.col("__w") != "")
    counts = f.groupBy("__w").agg(
        F.sum(F.when(F.col("__src") == source_a, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("__src") == source_b, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c2").cast("long").alias("n2"),
        )
    )
    dec = "decimal(38,0)"
    s = counts.crossJoin(totals).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(
            F.abs(
                F.col("c1").cast(dec) * F.col("n2").cast(dec)
                - F.col("c2").cast(dec) * F.col("n1").cast(dec)
            )
        ).alias("__s"),
    )
    return s.select(
        F.coalesce(F.col("n1"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.col("n2"), F.lit(0)).cast("long").alias("n2"),
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias(
            "n_words"
        ),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.expr(
                "CAST((`__s` * 1000000)"
                " DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
            ),
        ).alias("tvd_ppm"),
    )


def collapse_repeats(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Consecutive-duplicate token collapse (the "word word word"
    cleanup): keep token i iff i is first or differs from token i−1.
    Zero shuffle — pure per-row array lambdas. ``kept_fold`` (the
    ordered polynomial fold of the surviving tokens' hashes) pins the
    collapsed document under the oracle gate."""
    d = documents.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), _tokens(text_col).alias("toks")
    )
    # previous token via 0-based F.get (null out of range — so i=1
    # resolves through the OR without ever indexing position 0, which
    # element_at rejects at runtime)
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: (i == 1)
        | (F.element_at("toks", i) != F.get("toks", i - F.lit(2))),
    )
    d = d.select(
        id_col,
        F.size("toks").cast("long").alias("n_tokens"),
        F.transform(keep_idx, lambda i: F.element_at("toks", i)).alias("kept"),
    )
    fold = F.aggregate(
        F.transform("kept", _char_fold),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * POLY_BASE + h) % POLY_MOD,
    )
    return d.select(
        id_col,
        "n_tokens",
        F.size("kept").cast("long").alias("n_kept"),
        fold.alias("kept_fold"),
    )


def source_vocab_jaccard(
    documents: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise Jaccard similarity between sources' vocabularies —
    the corpus-composition profile that flags near-identical crawl
    snapshots or mislabeled source tags before they skew a mixture.

    Set-similarity done as an equi-join, never source×source over
    rows: distinct (source, word) — one partial-agg'd shuffle over
    the corpus — then the intersection count is a self-join keyed on
    the word, whose per-key fan-out is bounded by n_sources², and
    per-source vocabulary sizes broadcast back. Output is one row
    per unordered source pair, jaccard in ppm (integer DIV)."""
    vocab = (
        documents.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(source_col).alias("src"), _tokens(text_col).alias("toks"))
        .select("src", F.explode("toks").alias("word"))
        .distinct()
    )
    sizes = vocab.groupBy("src").agg(F.count(F.lit(1)).alias("vsize"))
    a = vocab
    b = vocab.select(F.col("src").alias("src_b"), F.col("word").alias("word"))
    inter = (
        a.join(b, "word")
        .filter(F.col("src") < F.col("src_b"))
        .groupBy(F.col("src").alias("source_a"), F.col("src_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("src").alias("source_a"),
                                     F.col("vsize").alias("size_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("src").alias("source_b"),
                                     F.col("vsize").alias("size_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_inter",
            (F.col("size_a") + F.col("size_b") - F.col("n_inter")).alias("n_union"),
        )
    )
    return out.select(
        "source_a",
        "source_b",
        "n_inter",
        "n_union",
        F.expr("(n_inter * 1000000) DIV n_union").alias("jaccard_ppm"),
    )


def acceptance_bias_audit(
    scored: DataFrame,
    groups: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group acceptance-rate audit of a binary classifier — the
    fairness screen over a quality filter: if the accept rate for one
    language (or source) collapses, the filter is curating a biased
    corpus. ``scored`` is hashed_quality_scores-shaped (id, accept);
    ``groups`` maps id → group.

    Integer-exact: accept_ppm = accepted·10⁶ DIV n per group, and
    lift_ppm = accept_ppm·10⁶ DIV overall_ppm (overall as a 1-row
    broadcast — no collect). Plan: one join on the doc id, one
    group-grain agg, one scalar agg broadcast back."""
    j = scored.select(id_col, F.col("accept").cast("int").alias("__a")).join(
        groups.select(id_col, group_col), on=id_col
    )
    per = j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__a").cast("long").alias("n_accepted"),
    )
    overall = j.agg(
        F.count(F.lit(1)).alias("__tn"),
        F.sum("__a").cast("long").alias("__ta"),
    )
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            group_col,
            "n_docs",
            "n_accepted",
            F.expr("n_accepted * 1000000 DIV n_docs").alias("accept_ppm"),
            F.when(
                F.col("__ta") > 0,
                F.expr(
                    "(n_accepted * 1000000 DIV n_docs) * 1000000 "
                    "DIV (__ta * 1000000 DIV __tn)"
                ),
            ).alias("lift_ppm"),
        )
        .orderBy(group_col)
    )
