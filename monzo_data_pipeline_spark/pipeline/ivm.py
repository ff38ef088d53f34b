"""Incremental view maintenance for JOIN views — the insert-only
delta rule, folded through mergeable aggregate state.

`pipeline/incremental.py` maintains SINGLE-TABLE algebraic aggregates
(the reference's gold layer recomputed-from-all-of-silver each run,
/root/reference/src/sql/create_gold_layer.sql). But a warehouse's
expensive views are JOINs and join-aggregates, and at 100 TB
"recompute the view" rescans the full fact history per batch. For
append-only relations — exactly the medallion model this pipeline
uses (bronze/silver only ever receive inserts; corrections arrive as
new versions handled by the SCD2/upsert operators) — the classic IVM
delta rule (Blakeley et al. 1986; DBToaster; Materialize) is exact:

    Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
    (B_new = B_old ∪ ΔB; equivalent to the symmetric three-term form
     ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, with one join fewer)

and an aggregated join view never materializes Δ(A⋈B) at all: the
delta rows partial-aggregate to per-group state (DECIMAL sums +
counts — the algebraic decomposition), which merges into the persisted
view state by UNION + re-SUM, the same fold `incremental.py` proved
for one table.

Scale shape: both delta joins BROADCAST the delta side, so the big
relations are never shuffled — per batch the cost is |Δ| × (scan of
the other side's join column stripe), and with the warehouse's
stat/bloom manifests the A_old ⋈ ΔB probe prunes to the files whose
key ranges intersect the delta. The view-state merge is bounded by
the group-key domain, never by history. Correctness is oracle-gated:
registry queries `ivm_join_delta` (the delta rule itself — Spark
computes Δ, DuckDB computes new-join-minus-old-join) and
`ivm_revenue_view` (a 3-batch incremental fold of the revenue view ==
the one-shot join-aggregate, bit-exact DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .medallion import Warehouse


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Rows ADDED to the inner-join view A ⋈ B when ΔA and ΔB arrive
    (insert-only). Exact: new_join − old_join, computed without ever
    building either join. `on` is the shared equi-join column list.

    Plan: ΔA ⋈ (B_old ∪ ΔB) plus A_old ⋈ ΔB — the delta side of each
    join broadcasts (deltas are batch-sized by construction), so
    neither stored relation shuffles."""
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    b_new = b_old.unionByName(b_delta)
    return da.join(b_new, on).unionByName(a_old.join(db, on))


def join_view_retraction(
    a_new: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Rows REMOVED from the inner-join view A ⋈ B when delete
    batches Δ⁻A and Δ⁻B arrive — the delete-side delta rule (the
    insert rule of `join_view_delta` with its proof obligation
    inverted):

        Δ⁻(A ⋈ B) = Δ⁻A ⋈ B_old  ∪  A_new ⋈ Δ⁻B
        (A_new = A_old ∖ Δ⁻A; the two terms are DISJOINT — the first
         covers every removed join pair whose A row was deleted, the
         second those whose A row survived but whose B row was
         deleted — so the union is exact, no inclusion-exclusion)

    This is the reference's corrections-arrive-later case (a bronze
    correction retracting already-loaded join rows — the `settled`
    column that arrives null and is later rewritten, SURVEY §1.2)
    generalized to a JOIN view. Both delete batches broadcast, so the
    stored relations never shuffle; for an aggregated view, fold
    `negate_partial(partial-aggregate(result))` into the view state
    (counting IVM) instead of materializing the row delta, and drop
    groups whose count reaches 0."""
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    return da.join(b_old, on).unionByName(a_new.join(db, on))


def merge_agg_state(
    state: DataFrame | None, partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold one batch's partial aggregate into view state: UNION +
    per-key SUM of every non-key column (DECIMAL sums and BIGINT
    counts both merge by addition — the algebraic law
    `incremental.py` relies on). Returns the new state; pass
    state=None for the first batch."""
    merged = partial if state is None else state.unionByName(partial)
    val_cols = [c for c in merged.columns if c not in keys]
    sum_schema = dict(merged.dtypes)
    return merged.groupBy(*keys).agg(
        *[
            F.sum(c).cast(sum_schema[c]).alias(c)
            for c in val_cols
        ]
    )


def maintain_view_state(
    wh: Warehouse, table: str, partial: DataFrame, keys: list[str]
) -> None:
    """Persisted fold: merge one batch's partial aggregate into the
    warehouse view-state table (create on first batch). The merged
    state is fully materialized to a STAGING path first — the write
    job reads the live files, so no executor loss or cache eviction
    can ever recompute against a half-deleted source (the
    read-modify-overwrite hazard of persist()+count()+overwrite) —
    then swapped in with two metadata renames. The swap window is
    rename-only (no data job inside it) and CRASH-RECOVERABLE: if a
    driver died between the retire and promote renames, the next call
    finds the live path missing with `.__retired__` present and
    renames the full history back before merging — the partial batch
    is re-applied, never mistaken for the first batch (r10 fix). For
    exactly-once across a driver crash inside the window, use the
    streaming lane's versioned-dir scheme (streaming/sketches.py) or
    wrap in pipeline/atomic.py's transactional commit."""
    spark = partial.sparkSession
    live = wh.path(table).rstrip("/")
    stage, retired = live + ".__stage__", live + ".__retired__"
    jvm0 = spark._jvm
    fs0 = jvm0.org.apache.hadoop.fs.Path(live).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    if not wh.exists(table):
        if fs0.exists(jvm0.org.apache.hadoop.fs.Path(retired)):
            # crashed mid-swap: restore the retired full history
            # instead of silently re-initializing from one partial
            if not fs0.rename(
                jvm0.org.apache.hadoop.fs.Path(retired),
                jvm0.org.apache.hadoop.fs.Path(live),
            ):
                raise IOError(
                    f"found retired view state at {retired} but the "
                    f"live path {live} is missing and the recovery "
                    "rename failed — refusing to re-initialize"
                )
        else:
            wh.overwrite(merge_agg_state(None, partial, keys), table)
            return
    merged = merge_agg_state(wh.read(table), partial, keys)
    merged.write.mode("overwrite").parquet(stage)
    fs = fs0

    def _p(s: str):
        return jvm0.org.apache.hadoop.fs.Path(s)

    fs.delete(_p(retired), True)
    if not fs.rename(_p(live), _p(retired)):
        raise IOError(f"could not retire live state at {live}")
    if not fs.rename(_p(stage), _p(live)):
        # put the old state back rather than leave the view headless
        fs.rename(_p(retired), _p(live))
        raise IOError(f"could not promote staged state to {live}")
    fs.delete(_p(retired), True)


def negate_partial(partial: DataFrame, keys: list[str]) -> DataFrame:
    """Counting-IVM retraction: a DELETE batch folds into the view
    state as the NEGATED partial aggregate of the deleted rows (counts
    and DECIMAL sums both retract by sign flip — DBToaster's
    multiplicity algebra). After folding, groups whose count reaches 0
    have fully left the view: finalize with ``filter(count > 0)``.
    Exact for algebraic aggregates; MIN/MAX do not retract (holistic
    under deletes) — keep those on recompute or monotonic feeds."""
    dtypes = dict(partial.dtypes)
    return partial.select(
        *keys,
        *[
            (-F.col(c)).cast(dtypes[c]).alias(c)
            for c in partial.columns
            if c not in keys
        ],
    )
