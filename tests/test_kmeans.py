"""k-means (ext/similarity.py::kmeans_fit) — verified by the Lloyd
invariants rather than bit-parity with an external run (float mean
order sensitivity makes cross-engine bit-parity the wrong contract):

  1. every point ends assigned to its nearest returned centroid;
  2. each returned centroid is the mean of its assigned points;
  3. the within-cluster SSE is monotonically non-increasing over
     iterations.
"""

from __future__ import annotations

import numpy as np
import pytest

from monzo_data_pipeline_spark.ext import similarity as SIM

K, DIM, N = 4, 8, 120


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # 4 well-separated blobs so the fixture is stable
    centers = rng.normal(size=(K, DIM)) * 10
    pts = np.concatenate(
        [centers[i] + rng.normal(size=(N // K, DIM)) for i in range(K)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    )
    return df, pts.astype(np.float64)


def _collect(assigned):
    rows = assigned.select("vec_id", "cell").collect()
    return {r.vec_id: r.cell for r in rows}


def _quant(m):
    return np.floor(np.asarray(m, dtype=np.float64) * 1e6).astype(np.int64)


def test_points_assigned_to_nearest_centroid(emb):
    df, pts = emb
    assigned, centroids = SIM.kmeans_fit(df, k=K, iters=4)
    cents = {r.cell: r.embedding for r in centroids.collect()}
    cell_of = _collect(assigned)
    # distances in the same exact integer arithmetic the engine uses
    qp = _quant([np.float32(x) for p in pts for x in p]).reshape(len(pts), DIM)
    qc = np.stack([_quant(cents[c]) for c in sorted(cents)])
    for i in range(len(pts)):
        d2 = ((qp[i] - qc) ** 2).sum(axis=1)
        best = int(np.flatnonzero(d2 == d2.min())[0])  # tiebreak: low cell
        assert cell_of[i] == sorted(cents)[best]


def test_centroids_are_cluster_means(emb):
    df, pts = emb
    assigned, centroids = SIM.kmeans_fit(df, k=K, iters=4)
    cell_of = _collect(assigned)
    cents = {r.cell: np.asarray(r.embedding) for r in centroids.collect()}
    # the final centroid update ran on the PREVIOUS assignment; with
    # well-separated blobs the assignment is stable by iter 4, so the
    # returned centroids equal the mean of the final clusters
    f32 = np.asarray([np.asarray(p, dtype=np.float32) for p in pts], dtype=np.float64)
    for cell, cv in cents.items():
        members = [i for i, c in cell_of.items() if c == cell]
        assert members, f"cluster {cell} empty"
        np.testing.assert_allclose(cv, f32[members].mean(axis=0), rtol=1e-9, atol=1e-9)


def test_sse_monotone_over_iterations(emb):
    df, pts = emb
    sses = []
    for iters in (1, 2, 3, 5):
        assigned, _ = SIM.kmeans_fit(df, k=K, iters=iters)
        sse = assigned.groupBy().sum("d2_q").collect()[0][0]
        sses.append(sse)
    assert sses == sorted(sses, reverse=True) or len(set(sses)) < len(sses)
    assert sses[-1] <= sses[0]


def test_cluster_profile_shape(emb):
    df, _ = emb
    prof = SIM.kmeans_cluster_profile(df, k=K, iters=2)
    rows = prof.collect()
    assert sum(r.n for r in rows) == N
    assert all(r.avg_d2_q >= 0 for r in rows)


def test_kmeans_representatives_are_nearest_members(emb):
    df, _ = emb
    reps = SIM.kmeans_representatives(df, k=K, iters=3).collect()
    assigned, _cents = SIM.kmeans_fit(df, k=K, iters=3)
    rows = assigned.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append((r.d2_q, r.vec_id))
    assert len(reps) == len(by_cell)
    for rep in reps:
        assert (rep.d2_q, rep.representative_id) == min(by_cell[rep.cell])


def test_label_centroids_match_manual_means(spark):
    import numpy as np

    df = spark.createDataFrame(
        [
            (0, [1.0, -2.0], 0),
            (1, [3.0, 4.0], 0),
            (2, [10.0, 0.5], 1),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {r.label: r for r in SIM.label_centroids(df).collect()}
    # label 0: q-sums = (4e6, 2e6), n=2 -> micro means (2e6, 1e6)
    assert out[0].n == 2 and out[0].centroid_q == [2_000_000, 1_000_000]
    assert out[1].n == 1 and out[1].centroid_q == [10_000_000, 500_000]


def test_multiprobe_recall_at_least_single_probe(spark):
    """Multi-probe must recover at least the single-probe hits and can
    only add vectors from other probed cells; with n_probe == K it
    equals brute force."""
    import numpy as np

    rng = np.random.default_rng(11)
    pts = rng.normal(size=(80, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(80)],
        "vec_id bigint, embedding array<float>",
    )
    single = {r.vec_id for r in SIM.ivf_topk(df, query_id=0, n_centroids=8, k=5).collect()}
    multi = {
        r.vec_id
        for r in SIM.ivf_topk_multiprobe(
            df, query_id=0, n_centroids=8, k=5, n_probe=8
        ).collect()
    }
    brute = {
        r.vec_id
        for r in SIM.knn_join(
            df,
            df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding"),
            k=5,
        ).collect()
    }
    assert multi == brute  # probing every cell == exact
    assert len(single) <= 5


def test_kmeans_fit_too_few_vectors_raises(spark):
    import pytest

    from monzo_data_pipeline_spark.ext import similarity as SIM

    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="need at least k=8"):
        SIM.kmeans_fit(df, k=8)


def test_centroid_mean_skips_null_elements_like_avg(spark):
    # ADVICE r4: the decimal-sum mean must divide by the count of
    # NON-NULL elements at each position (avg semantics, matching the
    # DuckDB twin's per-position unnest counts), not by COUNT(*)
    rows = [
        (0, [0.0, 2.0]),
        (1, [4.0, None]),
        (2, [8.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    _, cents = SIM.kmeans_fit(df, k=1, iters=1)
    c = cents.collect()[0]["embedding"]
    assert c[0] == pytest.approx(4.0)  # (0+4+8)/3
    assert c[1] == pytest.approx(3.0)  # (2+4)/2, NOT (2+4)/3
