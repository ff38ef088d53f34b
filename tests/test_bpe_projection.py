"""BPE merge training (ext/bpe.py) vs an independent Python BPE
implementation, plus random-projection (ext/similarity.py) laws."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.ext import bpe as BPE
from monzo_data_pipeline_spark.ext.similarity import random_projection


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich'16): greedy pair merge over symbol
    sequences — list-of-symbols representation, no delimited-string
    trick, so it is an independent check of the replace() encoding."""
    corpus = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for syms, n in corpus.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # tiebreak: count DESC, left ASC, right ASC
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        new_corpus: dict[tuple, int] = {}
        for syms, n in corpus.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_corpus[key] = new_corpus.get(key, 0) + n
        corpus = new_corpus
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBpe:
    def test_matches_textbook_bpe(self, spark):
        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "wide wider widest",
        ]
        words: dict[str, int] = {}
        for t in texts:
            for w in t.lower().split():
                words[w] = words.get(w, 0) + 1
        want = _py_bpe(words, 5)
        got = [
            (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in BPE.bpe_merges(_docs(spark, texts), n_merges=5)
            .orderBy("step")
            .collect()
        ]
        assert got == want

    def test_overlapping_run_merges_left_to_right(self, spark):
        # 'aaaa' + merge (a,a) must yield aa,aa (not aa,a,a or a,aa,a)
        out = BPE.bpe_merges(_docs(spark, ["aaaa aaaa b"]), n_merges=2).collect()
        by_step = {r["step"]: r for r in out}
        assert (by_step[1]["left"], by_step[1]["right"]) == ("a", "a")
        # after step 1 each 'aaaa' is (aa, aa) → step 2 merges (aa, aa): 2 occurrences
        assert (by_step[2]["left"], by_step[2]["right"]) == ("aa", "aa")
        assert by_step[2]["pair_count"] == 2

    def test_early_stop_on_pairless_corpus(self, spark):
        out = BPE.bpe_merges(_docs(spark, ["a b c d"]), n_merges=4).collect()
        assert out == []  # every word is a single symbol: no pairs ever

    def test_delimiter_words_excluded(self, spark):
        wf = BPE.word_frequencies_for_bpe(_docs(spark, ["ok a|b ok"]))
        assert {r["w"] for r in wf.collect()} == {"ok"}


class TestRandomProjection:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>, label int",
        )

    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(11)
        vecs = rng.standard_normal((5, 64)).astype(np.float32)
        got = {
            r["vec_id"]: list(r["proj_q"])
            for r in random_projection(self._emb(spark, vecs)).collect()
        }
        for vid, v in enumerate(vecs):
            eq = [int(np.floor(float(np.float64(x)) * 1_000_000)) for x in v]
            want = [
                sum(
                    (1 if ((i * 31 + j * 17) % 2 == 0) else -1) * eq[i - 1]
                    for i in range(1, 65)
                )
                for j in range(16)
            ]
            assert got[vid] == want

    def test_projection_roughly_preserves_relative_distance(self, spark):
        """JL sanity: a vector's projection is much closer to a tiny
        perturbation of itself than to an independent vector."""
        rng = np.random.default_rng(5)
        a = rng.standard_normal(64).astype(np.float32)
        near = (a + 0.01 * rng.standard_normal(64).astype(np.float32)).astype(np.float32)
        far = rng.standard_normal(64).astype(np.float32)
        out = {
            r["vec_id"]: np.array(r["proj_q"], dtype=np.float64)
            for r in random_projection(self._emb(spark, [a, near, far])).collect()
        }
        d_near = np.linalg.norm(out[0] - out[1])
        d_far = np.linalg.norm(out[0] - out[2])
        assert d_near < d_far / 3

    def test_arrow_and_sql_impls_agree(self, spark):
        rng = np.random.default_rng(23)
        vecs = rng.standard_normal((7, 64)).astype(np.float32)
        emb = self._emb(spark, vecs)
        arrow = {
            r["vec_id"]: list(r["proj_q"])
            for r in random_projection(emb, impl="arrow").collect()
        }
        sql = {
            r["vec_id"]: list(r["proj_q"])
            for r in random_projection(emb, impl="sql").collect()
        }
        assert arrow == sql


def test_bpe_driver_loop_matches_distributed(spark, monkeypatch):
    """r11: the driver-side merge loop (vocabulary under
    BPE_DRIVER_FINISH_WORDS) must reproduce the distributed per-step
    loop exactly — merge table AND segmented corpus."""
    from monzo_data_pipeline_spark.ext import bpe as B

    docs = spark.createDataFrame(
        [(1, "low low lower lowest news newer new"),
         (2, "wide wider widest low new"),
         (3, "a ab abc abcd abcd ab")],
        "doc_id long, text string",
    )
    m_drv = [tuple(r) for r in B.bpe_merges(docs, n_merges=5).collect()]
    s_drv = sorted(
        (tuple(r.syms), r.n)
        for r in B.bpe_segment_corpus(docs, n_merges=5).collect()
    )
    monkeypatch.setattr(B, "BPE_DRIVER_FINISH_WORDS", 0)
    m_dist = [tuple(r) for r in B.bpe_merges(docs, n_merges=5).collect()]
    s_dist = sorted(
        (tuple(r.syms), r.n)
        for r in B.bpe_segment_corpus(docs, n_merges=5).collect()
    )
    assert m_drv == m_dist and len(m_drv) == 5
    assert s_drv == s_dist and len(s_drv) > 0
