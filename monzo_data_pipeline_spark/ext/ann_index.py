"""Persisted IVF index — build once, search many.

`ext/similarity.py::ivf_topk` recomputes the centroid assignment per
query; fine inside one job, wrong as a serving pattern: at 100 TB the
assignment IS the index and must be an artifact, not a subplan. Here
the assignment table is written to the warehouse PARTITIONED BY cell,
so a search's probe reads ONLY the probed cell's files — the
partition layout is the inverted-list structure of a classical IVF
index (FAISS's coarse quantizer), expressed as plain partitioned
parquet:

  * `build_ivf_index` — assign every vector to its nearest centroid
    (same deterministic quantized-dot argmax the oracle-gated
    `ivf_topk` uses) and write `(id, embedding, cell)` partitionBy
    cell. One extra table scan amortized over every future search.
  * `search_ivf_index` — locate the query's cell from the index
    itself, then brute-force only that cell. The 1-row query frame
    broadcast-joins the partitioned scan on the partition column, so
    Spark's dynamic partition pruning (DPP) reduces the file scan to
    the single probed directory — search cost ∝ cell size, not
    table size, at the FILE level, verified by the plan test.

Index searches return bit-identical results to the fresh
`ivf_topk` path (same assignment rule, same tie-breaks) — asserted in
tests and by the registry query `ivf_index_search`, whose oracle is
the SAME DuckDB twin as `ivf_topk`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.medallion import Warehouse
from .similarity import ivf_assign, quantized_dot


def build_ivf_index(
    wh: Warehouse,
    emb: DataFrame,
    table: str = "ivf_index",
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF assignment as a cell-partitioned warehouse
    table (the centroid rule matches ivf_topk: first n_centroids ids,
    quantized-dot argmax, ties to the lower cell)."""
    centroids = emb.filter(F.col(id_col) < n_centroids)
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        wh.path(table)
    )
    # persist the builder's parameters next to the index: the
    # centroid set is DEFINED by n_centroids (vec_id < K is only the
    # centroid rule under the builder's K), so a search must read K
    # from the artifact, never guess it
    spark = emb.sparkSession
    spark.createDataFrame(
        [(int(n_centroids),)], "n_centroids int"
    ).coalesce(1).write.mode("overwrite").parquet(
        wh.path(table + "__meta")
    )


def _index_n_centroids(
    spark: SparkSession, wh: Warehouse, table: str
) -> int:
    """The builder's n_centroids, read from the index's metadata
    table (written by build_ivf_index)."""
    meta = spark.read.parquet(wh.path(table + "__meta"))
    return int(meta.head()["n_centroids"])


def search_ivf_index(
    spark: SparkSession,
    wh: Warehouse,
    table: str = "ivf_index",
    query_id: int = 0,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors of `query_id` from the persisted index: probe
    exactly the query's cell. The broadcast 1-row query joined on the
    PARTITION column lets DPP prune the scan to one directory."""
    assigned = spark.read.parquet(wh.path(table))
    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col("cell").alias("q_cell"), F.col(vec_col).alias("__qvec")
    )
    mates = assigned.join(
        F.broadcast(q),
        (F.col("cell") == F.col("q_cell"))
        & (F.col(id_col) != query_id),
    )
    return (
        mates.select(
            id_col,
            # partition-column directory inference reads cell as INT;
            # cast back so the index path's schema matches the fresh
            # ivf_topk path (and the shared oracle) exactly
            F.col("cell").cast("bigint").alias("cell"),
            quantized_dot(vec_col, "__qvec").alias("dot_q"),
        )
        .orderBy(F.desc("dot_q"), F.asc(id_col))
        .limit(k)
    )


def search_ivf_index_multiprobe(
    spark: SparkSession,
    wh: Warehouse,
    table: str = "ivf_index",
    query_id: int = 0,
    k: int = 5,
    n_probe: int = 3,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe search on the persisted index: rank the centroids
    against the query (the centroid VECTORS live in the index — they
    are its first n_centroids rows, same rule as the builder) and scan
    the top `n_probe` cell directories. DPP prunes the partitioned
    scan to those n_probe directories; everything query-side is a
    ≤K-row broadcast. Bit-identical to the fresh
    `similarity.ivf_topk_multiprobe` subplan.

    `n_centroids` defaults to the value persisted by the BUILDER
    (the index's metadata table) — `vec_id < K` is only the centroid
    rule under the builder's K, so a caller-supplied K that differs
    would silently rank non-centroid rows as centroids and probe
    wrong cells; an explicit value is checked against the metadata."""
    built_k = _index_n_centroids(spark, wh, table)
    if n_centroids is None:
        n_centroids = built_k
    elif n_centroids != built_k:
        raise ValueError(
            f"index {table!r} was built with n_centroids={built_k}, "
            f"search asked for {n_centroids}"
        )
    assigned = spark.read.parquet(wh.path(table))
    qvec = assigned.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec")
    )
    centroids = assigned.filter(F.col(id_col) < n_centroids)
    probe = (
        centroids.crossJoin(F.broadcast(qvec))
        .select(
            F.col(id_col).alias("__pcell"),
            quantized_dot(vec_col, "__qvec").alias("__s"),
        )
        .orderBy(F.desc("__s"), F.asc("__pcell"))
        .limit(n_probe)
        .select("__pcell")
    )
    return (
        assigned.join(
            F.broadcast(probe), F.col("cell") == F.col("__pcell")
        )
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qvec))
        .select(
            id_col,
            F.col("cell").cast("bigint").alias("cell"),
            quantized_dot(vec_col, "__qvec").alias("dot_q"),
        )
        .orderBy(F.desc("dot_q"), F.asc(id_col))
        .limit(k)
    )
