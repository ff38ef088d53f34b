"""Session-scoped materialized intermediates — the CROSS-QUERY analog
of ``operators/rankstats.py::binned_cells`` (which shares one fused
grid build across the two margins of a single query).

Several registry queries derive from the same BOUNDED intermediate:
six graph queries rebuild the identical support-2 co-purchase edge
set from lineitem, ``modularity_copurchase`` re-runs the exact
4-round LPA labeling ``communities_copurchase`` just produced, and
the deterministic-sketch family re-derives cell/register state the
merge laws prove is reusable. Each query must stay a SELF-CONTAINED
oracle unit (the driver runs any subset, in any order, concurrently),
so the sharing contract is a build-once/read-many memo:

- ``shared_frame(spark, key, build)`` returns the frame for ``key``,
  building + materializing it to parquet on first use (per Spark
  application, per key) and serving a flat parquet scan afterwards.
- Only BOUNDED artifacts belong here: edge sets, label tables, sketch
  cells/registers — metadata-sized regardless of fact-table scale
  (the 100 TB posture: these are exactly the frames a warehouse would
  persist as materialized views / sketch state, which is why the
  parquet round-trip is the honest form of the memo — it is the
  cluster-wide shareable representation, unlike an executor-local
  cache).
- Correctness is memo-independent: every builder is deterministic
  (bit-stable under partitioning), values survive the long/decimal
  parquet round-trip exactly, and the DuckDB oracle never sees the
  memo — the cross-engine hash gate would catch any divergence.

Thread-safety: the driver's bench runs queries concurrently; a
per-key lock makes the first caller build while later callers wait
and then read (instead of duplicating the build).
"""

from __future__ import annotations

import atexit
import hashlib
import shutil
import tempfile
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_GLOBAL_LOCK = threading.Lock()
_KEY_LOCKS: dict[tuple[str, str], threading.Lock] = {}
_PATHS: dict[tuple[str, str], str] = {}
_TMP_ROOT: str | None = None


def _root() -> str:
    global _TMP_ROOT
    if _TMP_ROOT is None:
        _TMP_ROOT = tempfile.mkdtemp(prefix="mdps_shared_")
        atexit.register(shutil.rmtree, _TMP_ROOT, ignore_errors=True)
    return _TMP_ROOT


def shared_frame(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized frame for ``key`` (build + write parquet on
    first use in this Spark application; flat parquet scan after).

    ``key`` must uniquely determine the frame's CONTENT — include the
    sf_dir/table path for data-derived artifacts. ``build`` must be
    deterministic; it runs at most once per (application, key)."""
    app = spark.sparkContext.applicationId
    k = (app, key)
    with _GLOBAL_LOCK:
        klock = _KEY_LOCKS.setdefault(k, threading.Lock())
    with klock:
        path = _PATHS.get(k)
        if path is None:
            digest = hashlib.sha256(key.encode()).hexdigest()[:16]
            path = f"{_root()}/{digest}"
            build().write.mode("overwrite").parquet(path)
            _PATHS[k] = path
    return spark.read.parquet(path)


def shared_artifact(
    spark: SparkSession, key: str, build: Callable[[str], None]
) -> str:
    """Memoize a side-effecting BUILD step that populates a durable
    on-disk artifact (an IVF index, a scratch warehouse) and return
    the artifact's root path.

    Unlike ``shared_frame``, what is memoized is the ARTIFACT, never
    a query answer: callers run their (timed) query against the
    returned path on EVERY call, so the plan that executes suite-side
    is the real probe (DPP-pruned cell scan, layout audit), not a
    flat scan of a cached result. ``build(path)`` populates the
    directory; it runs at most once per (application, key). The path
    lives under the session temp root and is removed at interpreter
    exit — the build-once/serve-many lifetime of a warehouse index."""
    app = spark.sparkContext.applicationId
    k = (app, "artifact::" + key)
    with _GLOBAL_LOCK:
        klock = _KEY_LOCKS.setdefault(k, threading.Lock())
    with klock:
        path = _PATHS.get(k)
        if path is None:
            digest = hashlib.sha256(key.encode()).hexdigest()[:16]
            path = f"{_root()}/art_{digest}"
            build(path)
            _PATHS[k] = path
    return path


def copurchase_sup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared support-weighted co-purchase part graph (a < b, sup =
    co-occurring orders, kept at sup ≥ 2) — consumed by the seven
    graph-tier queries (unweighted/weighted edge views), by
    `scc_part_precedence` (pair restriction), and by
    `frequently_bought_together` (sup ≥ 3 top-N view). Built as
    collect_set per order + map-side pair explosion (one shuffle
    fewer than a distinct+self-join; per-order fan-out bounded by the
    basket size at any data scale)."""
    from pyspark.sql import functions as F

    from ..catalog import load_table

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        per_order = li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("ps")
        )
        return (
            per_order.select(F.explode("ps").alias("p"), "ps")
            .select("p", F.explode("ps").alias("p2"))
            .filter(F.col("p") < F.col("p2"))
            .groupBy(F.col("p").alias("a"), F.col("p2").alias("b"))
            .agg(F.count(F.lit(1)).alias("sup"))
            .filter(F.col("sup") >= 2)
        )

    return shared_frame(spark, f"copurchase_sup::{sf_dir}", build)


def ngram_jaccard_pairs_06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared 5-gram Jaccard near-dup pair table over documents at
    threshold 0.6 — `ngram_jaccard_pairs`, `near_dup_clusters`, and
    `near_dup_clusters_star` all consume this identical pair set (the
    two CC variants previously re-ran the full shingle→block→verify
    pipeline the pair query had just executed). Bounded by
    construction: near-dup PAIRS, not the shingle table. The jaccard
    DOUBLE survives the parquet round-trip bit-exactly (IEEE bits are
    stored, not re-derived)."""
    from ..catalog import load_table
    from . import dedup_fuzzy as DF

    return shared_frame(
        spark,
        f"ngram_jaccard_pairs_06::{sf_dir}",
        lambda: DF.ngram_jaccard_pairs(
            load_table(spark, sf_dir, "documents"), threshold=0.6
        ),
    )


def balance_spend_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared 10×10 decile cell grid of (customer balance cents,
    customer spend cents) — `kendall_tau_balance_spend` and
    `theilsen_balance_spend` run their pair statistics off this
    IDENTICAL ≤100-row grid (each previously re-ran the
    customer⋈spend join and the fused two-margin ntile pass); both
    operators already expose the ``cells=`` fast path."""
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..operators import fin as FIN
    from ..operators import rankstats as RS

    built = []

    def build() -> DataFrame:
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", FIN._cents("c_acctbal").alias("bal_cents")
        )
        spend = (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                F.sum(FIN._cents("o_totalprice"))
                .cast("long")
                .alias("spend_cents")
            )
        )
        j = cust.join(spend, cust["c_custkey"] == spend["o_custkey"])
        cells = RS.binned_cells(
            j, "bal_cents", "spend_cents", "c_custkey", n_bins=10
        )
        built.append(cells)
        return cells

    out = shared_frame(spark, f"balance_spend_cells_10::{sf_dir}", build)
    for c in built:  # binned_cells returns a persisted frame the
        c.unpersist()  # caller owns; the parquet memo replaces it
    return out


def kmeans_assignment_8_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared deterministic Lloyd assignment (k=8, iters=3) over the
    embeddings table — `kmeans_cluster_profile` and
    `kmeans_representatives` aggregate this IDENTICAL (vec_id, cell,
    d2_q) label table (each previously re-ran the 3-iteration
    trainer). Entity-grain, all-integer columns."""
    from ..catalog import load_table
    from . import similarity as SIM

    def build() -> DataFrame:
        assigned, _ = SIM.kmeans_fit(
            load_table(spark, sf_dir, "embeddings"), k=8, iters=3
        )
        return assigned

    return shared_frame(spark, f"kmeans_assignment_8_3::{sf_dir}", build)


def events_value_cells_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-event-type quantile-grid cell state over quantized
    events.value cents — `mad_robust_outliers_approx` finalizes its
    per-group medians from it directly, and
    `equi_depth_histogram_approx` collapses it to the ungrouped state
    by SUM (the grid merge law). ≤ ~3 810 cells per event type."""
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..operators.fin import _cents
    from ..operators.sketches import quantile_grid_cells

    def build() -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        base = ev.select(
            "event_type", _cents("value").alias("__v")
        ).filter(F.col("__v").isNotNull())
        return quantile_grid_cells(base, "__v", ["event_type"])

    return shared_frame(spark, f"events_value_cells_by_type::{sf_dir}", build)


def orders_custkey_monthly_registers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shared per-month deterministic-HLL register state over
    orders.o_custkey — `hll_monthly_customers` finalizes it per month
    and `approx_aggregates` collapses it to the global estimate via
    per-bucket MAX (the HLL merge law; exact because o_orderdate is
    never NULL, so no counted row lacks a group). ≤ 1 024 registers
    per month."""
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..operators.sketches import hll_registers_by_group

    def build() -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_custkey",
        )
        return hll_registers_by_group(o, "o_custkey", "order_month")

    return shared_frame(
        spark, f"orders_custkey_monthly_regs::{sf_dir}", build
    )


def clear_shared() -> None:
    """Drop every memoized artifact (tests that mutate source tables
    between runs, or memory-pressure hygiene)."""
    global _TMP_ROOT
    with _GLOBAL_LOCK:
        _KEY_LOCKS.clear()
        _PATHS.clear()
        if _TMP_ROOT is not None:
            shutil.rmtree(_TMP_ROOT, ignore_errors=True)
            _TMP_ROOT = None
