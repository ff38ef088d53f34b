"""Product-quantization ANN tests (ext/similarity.py PQ tier)."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from monzo_data_pipeline_spark.ext import similarity as SIM  # noqa: E402


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _exact_topk(emb, query_id, k):
    q = emb.filter(f"vec_id = {query_id}").selectExpr("embedding AS qv")
    return [
        r.vec_id
        for r in (
            emb.crossJoin(F.broadcast(q))
            .filter(f"vec_id <> {query_id}")
            .select(
                "vec_id",
                SIM.quantized_dist_sq("embedding", "qv").alias("d2"),
            )
            .orderBy("d2", "vec_id")
            .limit(k)
            .collect()
        )
    ]


def test_pq_fit_shapes_and_determinism(emb):
    cbs = SIM.pq_fit(emb, m=8, ksub=16, iters=2)
    assert len(cbs) == 8 * 16
    assert all(len(v) == 8 for _, _, v in cbs)  # dsub = 64/8
    cbs2 = SIM.pq_fit(emb, m=8, ksub=16, iters=2)
    assert cbs == cbs2  # deterministic init + decimal means


def test_pq_fit_validation(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        SIM.pq_fit(emb, m=7)
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        SIM.pq_fit(empty)


def test_pq_encode_codes_bounded_and_complete(emb):
    cbs = SIM.pq_fit(emb, m=8, ksub=16, iters=2)
    codes = SIM.pq_encode(emb, cbs)
    n = emb.count()
    assert codes.count() == n  # every vector coded
    bad = codes.filter(
        "size(codes) <> 8 OR exists(codes, c -> c < 0 OR c >= 16)"
    ).count()
    assert bad == 0


def test_pq_exact_when_codebook_holds_every_vector(spark):
    """Degenerate anchor: ksub == n and 0 iterations of drift — every
    subvector is its own centroid, so ADC distance equals the exact
    quantized distance and the PQ ranking is the exact ranking."""
    vals = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (1, [0.1, 0.0, 1.0, 0.9]),
        (2, [5.0, 5.0, -3.0, -3.0]),
        (3, [0.2, 0.1, 0.8, 1.1]),
        (4, [9.0, -9.0, 2.0, 0.0]),
        (5, [0.05, 0.02, 1.05, 0.95]),
    ]
    df = spark.createDataFrame(vals, "vec_id bigint, embedding array<double>")
    # iters=0 keeps the seed codebook = the vectors themselves
    cbs = SIM.pq_fit(df, m=2, ksub=6, iters=0)
    got = [
        (r.vec_id, r.adc_d2_q)
        for r in SIM.pq_adc_topk(df, cbs, query_id=0, k=5).collect()
    ]
    q = [0.0, 0.0, 1.0, 1.0]

    import math

    def qz(x):
        return math.floor(x * 1000000.0)

    want = sorted(
        (
            sum((qz(a) - qz(b)) ** 2 for a, b in zip(v, q)),
            i,
        )
        for i, v in vals
        if i != 0
    )[:5]
    assert got == [(i, d) for d, i in want]


def test_pq_rerank_recall_and_exact_order(emb):
    cbs = SIM.pq_fit(emb, m=8, ksub=16, iters=3)
    exact10 = _exact_topk(emb, 0, 10)
    rr = [
        r.vec_id
        for r in SIM.pq_adc_rerank_topk(
            emb, cbs, query_id=0, k=10, oversample=10
        ).collect()
    ]
    # compressed-domain cut keeps most true neighbors; re-rank order
    # among survivors is exact by construction
    recall = len(set(rr) & set(exact10)) / 10
    assert recall >= 0.5, recall
    # whatever survived must appear in exact relative order
    pos = {v: i for i, v in enumerate(exact10)}
    kept = [v for v in rr if v in pos]
    assert kept == sorted(kept, key=lambda v: pos[v])


def test_pq_registry_entry_runs(spark, sf_dir):
    from monzo_data_pipeline_spark.registry import queries

    df = queries()["pq_rerank_topk"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["vec_id", "d2_q"]
