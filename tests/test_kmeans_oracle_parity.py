"""Randomized cross-engine parity for the r4 Lloyd-chain oracles.

The kmeans/PQ promotion rests on an exactness contract (integer
quantized distances + decimal-sum → IEEE-double-divide means, floats
widened to double before the decimal cast). The registry gate proves it
on the fixed testdata; this test probes it on RANDOM float32 corpora —
seeded draws, so failures reproduce — to show the contract is not
dataset luck. Any drift (a decimal rounding tie, a float-repr quirk)
appears as a hash mismatch here first.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.ext import similarity as SIM  # noqa: E402


def _write_random_embeddings(path: str, n: int, dim: int, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    # float32 like the real table; mixed scales + exact ties on purpose
    vecs = rng.normal(0, 1, (n, dim)).astype(np.float32)
    vecs[:: max(n // 7, 1)] *= 100.0  # outlier rows
    vecs[1::5, 0] = 0.5  # exactly-representable repeated values
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([f"l{i % 5}" for i in range(n)]),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize("seed", [11, 42, 1337])
def test_kmeans_profile_matches_oracle_on_random_corpora(spark, tmp_path, seed):
    n, dim, k, iters = 120, 16, 5, 3
    pq_path = str(tmp_path / "embeddings.parquet")
    _write_random_embeddings(pq_path, n, dim, seed)

    emb = spark.read.parquet(pq_path)
    got = [
        (r["cell"], r["n"], r["avg_d2_q"])
        for r in SIM.kmeans_cluster_profile(emb, k=k, iters=iters).collect()
    ]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{pq_path}'")
    want = [
        (int(a), int(b), int(c))
        for a, b, c in con.sql(
            SIM.kmeans_profile_oracle_sql(k=k, iters=iters)
        ).fetchall()
    ]
    con.close()
    assert got == want


@pytest.mark.parametrize("seed", [7, 99])
def test_pq_rerank_matches_oracle_on_random_corpora(spark, tmp_path, seed):
    n, dim = 90, 16
    m, ksub, iters, k, oversample = 4, 6, 2, 5, 4
    pq_path = str(tmp_path / "embeddings.parquet")
    _write_random_embeddings(pq_path, n, dim, seed)

    emb = spark.read.parquet(pq_path)
    cbs = SIM.pq_fit(emb, m=m, ksub=ksub, iters=iters)
    got = [
        (r["vec_id"], r["d2_q"])
        for r in SIM.pq_adc_rerank_topk(
            emb, cbs, query_id=0, k=k, oversample=oversample
        ).collect()
    ]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{pq_path}'")
    want = [
        (int(a), int(b))
        for a, b in con.sql(
            SIM.pq_rerank_oracle_sql(
                m=m, ksub=ksub, iters=iters, dim=dim,
                query_id=0, k=k, oversample=oversample,
            )
        ).fetchall()
    ]
    con.close()
    assert got == want
