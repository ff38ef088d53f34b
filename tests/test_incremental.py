"""Incremental gold maintenance: state ⊕ delta must equal a full
recompute, bit-for-bit, however history is batched."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.pipeline import incremental as INC
from monzo_data_pipeline_spark.pipeline import ingest as ING
from monzo_data_pipeline_spark.pipeline import medallion as MED


@pytest.fixture()
def warehouse(spark, tmp_path):
    return MED.Warehouse(spark, str(tmp_path / "wh"))


def _silver_batch(spark, start_day: int, n_windows: int, seed_tag: str):
    fetch = ING.make_fake_fetch(n_per_window=40, dup_every=10)
    windows = ING.cursor_windows(
        datetime(2025, 1, start_day),
        datetime(2025, 1, start_day + n_windows),
        window_hours=24,
    )
    wire = ING.fetch_transactions_distributed(spark, fetch, windows)
    bronze = ING.flatten_bronze(wire, ingest_ts=f"2025-02-01T00:00:0{seed_tag}")
    # project to the silver grain the gold agg reads: id, created, amount
    return bronze.select(
        "id",
        "created",
        (F.col("amount").cast("decimal(18,2)") / 100)
        .cast("decimal(18,2)")
        .alias("amount"),
    )


def _normalize(df):
    return sorted(
        map(
            tuple,
            df.select(
                "year",
                "month",
                F.col("total_spend").cast("double"),
                F.col("avg_spend").cast("double"),
            ).collect(),
        )
    )


def test_incremental_equals_full_recompute(spark, warehouse):
    b1 = _silver_batch(spark, 1, 3, "1")
    b2 = _silver_batch(spark, 4, 2, "2")
    b3 = _silver_batch(spark, 6, 4, "3")

    # incremental path: fold batch by batch
    for b in (b1, b2, b3):
        INC.merge_gold_state(warehouse, b)
    incr = _normalize(INC.gold_from_state(warehouse))

    # full-recompute path over the concatenated history
    full_rows = b1.unionByName(b2).unionByName(b3)
    warehouse.overwrite(full_rows, MED.SILVER_TX)
    MED.build_gold(warehouse)
    full = _normalize(warehouse.read(MED.GOLD_MONTHLY))

    assert incr == full
    assert len(incr) > 0


def test_state_is_batching_invariant(spark, warehouse):
    """Folding (b1, b2) must equal folding (b1 ∪ b2) in one go."""
    b1 = _silver_batch(spark, 1, 2, "1")
    b2 = _silver_batch(spark, 3, 2, "2")

    wh_a = MED.Warehouse(spark, warehouse.root + "_a")
    INC.merge_gold_state(wh_a, b1)
    INC.merge_gold_state(wh_a, b2)

    wh_b = MED.Warehouse(spark, warehouse.root + "_b")
    INC.merge_gold_state(wh_b, b1.unionByName(b2))

    assert _normalize(INC.gold_from_state(wh_a)) == _normalize(
        INC.gold_from_state(wh_b)
    )


def test_streaming_gold_equals_batch_and_survives_replay(spark, warehouse, tmp_path):
    """Silver rows streamed through foreachBatch fold to the same gold
    as a batch recompute; a full replay (fresh checkpoint, same files)
    folds nothing twice thanks to the epoch ledger."""
    from monzo_data_pipeline_spark.streaming.ingest import stream_silver_to_gold

    silver = _silver_batch(spark, 1, 4, "1").cache()
    drops = str(tmp_path / "silver_drops")
    silver.repartition(3).write.parquet(drops)

    def run(ckpt):
        stream = (
            spark.readStream.schema(silver.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
        )
        q = stream_silver_to_gold(stream, warehouse, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")
    incr = _normalize(INC.gold_from_state(warehouse))

    warehouse.overwrite(silver, MED.SILVER_TX)
    MED.build_gold(warehouse)
    assert incr == _normalize(warehouse.read(MED.GOLD_MONTHLY))

    # full replay with a fresh checkpoint: ledger skips every epoch
    run("ckpt2")
    assert _normalize(INC.gold_from_state(warehouse)) == incr
