"""Persisted IVF index (ext/ann_index.py, r8)."""

from __future__ import annotations

import pyspark.sql.functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.ext import similarity as SIM
from monzo_data_pipeline_spark.ext.ann_index import (
    build_ivf_index,
    search_ivf_index,
)
from monzo_data_pipeline_spark.pipeline.medallion import Warehouse


def test_index_search_equals_fresh_path(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, emb)
    for qid in (0, 7, 123):
        got = search_ivf_index(spark, wh, query_id=qid, k=5)
        want = SIM.ivf_topk(emb, query_id=qid, n_centroids=16, k=5)
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
        assert got.dtypes == want.dtypes


def test_index_search_prunes_partitions(spark, sf_dir, tmp_path):
    """The probe must touch ONE cell directory: dynamic partition
    pruning appears in the executed plan, and the physically read
    rows (via the post-scan count of distinct input files) stay
    bounded by the probed cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, emb)
    got = search_ivf_index(spark, wh, query_id=0, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()

    # physical proof: rows scanned under the query-cell filter == the
    # cell's membership, far below the table
    assigned = spark.read.parquet(wh.path("ivf_index"))
    q_cell = (
        assigned.filter(F.col("vec_id") == 0).select("cell").collect()[0][0]
    )
    cell_rows = assigned.filter(F.col("cell") == q_cell)
    files = (
        cell_rows.select(
            F.input_file_name().alias("f")
        ).distinct().count()
    )
    all_files = (
        assigned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert files < all_files  # the filter reads a strict file subset


def test_index_is_an_artifact_not_a_subplan(spark, sf_dir, tmp_path):
    """A second Warehouse handle (fresh session state) searches the
    same files — the index survives the builder's lineage."""
    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "wh")
    build_ivf_index(Warehouse(spark, root), emb)
    wh2 = Warehouse(spark, root)
    got = search_ivf_index(spark, wh2, query_id=42, k=3)
    want = SIM.ivf_topk(emb, query_id=42, n_centroids=16, k=3)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_multiprobe_index_search_equals_fresh_path(spark, sf_dir, tmp_path):
    from monzo_data_pipeline_spark.ext.ann_index import (
        search_ivf_index_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, emb)
    for qid, probes in ((0, 3), (57, 1), (200, 5)):
        got = search_ivf_index_multiprobe(
            spark, wh, query_id=qid, k=5, n_probe=probes
        )
        want = SIM.ivf_topk_multiprobe(
            emb, query_id=qid, n_centroids=16, k=5, n_probe=probes
        )
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
    # single-probe multiprobe == the plain index search (same cell)
    got1 = search_ivf_index_multiprobe(
        spark, wh, query_id=0, k=5, n_probe=1
    )
    want1 = search_ivf_index(spark, wh, query_id=0, k=5)
    assert [tuple(r) for r in got1.collect()] == [
        tuple(r) for r in want1.collect()
    ]


def test_multiprobe_reads_n_centroids_from_index_metadata(
    spark, sf_dir, tmp_path
):
    """The builder's K is persisted with the index; a default search
    picks it up, and a mismatched explicit K is an error instead of a
    silent wrong-cell probe (vec_id < K is only the centroid rule
    under the builder's K)."""
    import pytest

    from monzo_data_pipeline_spark.ext.ann_index import (
        search_ivf_index_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, emb, n_centroids=8)
    got = search_ivf_index_multiprobe(
        spark, wh, query_id=3, k=4, n_probe=2
    )
    want = SIM.ivf_topk_multiprobe(
        emb, query_id=3, n_centroids=8, k=4, n_probe=2
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    # explicit-but-matching K is accepted
    search_ivf_index_multiprobe(
        spark, wh, query_id=3, k=4, n_probe=2, n_centroids=8
    ).collect()
    with pytest.raises(ValueError, match="built with n_centroids=8"):
        search_ivf_index_multiprobe(
            spark, wh, query_id=3, k=4, n_probe=2, n_centroids=16
        )
