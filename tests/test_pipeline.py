"""Medallion pipeline e2e (SURVEY.md §5 strategy #3): synthetic
bronze → silver → gold, and the idempotence property behind the
reference's INSERT OR IGNORE semantics (running the same batch twice
leaves every table identical)."""

from __future__ import annotations

from datetime import datetime

import pytest

from monzo_data_pipeline_spark.pipeline import ingest as ING
from monzo_data_pipeline_spark.pipeline import medallion as MED


@pytest.fixture()
def warehouse(spark, tmp_path):
    return MED.Warehouse(spark, str(tmp_path / "wh"))


def _batch(spark, n_windows=3):
    fetch = ING.make_fake_fetch(n_per_window=40, dup_every=10)
    windows = ING.cursor_windows(
        datetime(2025, 1, 1), datetime(2025, 1, 1 + n_windows), window_hours=24
    )
    wire = ING.fetch_transactions_distributed(spark, fetch, windows)
    return ING.flatten_bronze(wire, ingest_ts="2025-01-05T00:00:00")


def test_distributed_ingest_shape(spark):
    batch = _batch(spark)
    rows = batch.collect()
    assert len(rows) == 120  # 3 windows x 40
    cols = set(batch.columns)
    # the 32-col bronze layout incl. flattened merchant address (A7)
    assert {"id", "merchant_city", "counterparty_account_num", "date_retrieved"} <= cols
    # missing merchants → null-safe flatten, not a template
    assert any(r.merchant_id is None for r in rows)
    # late-arriving settled nulls survive
    assert any(r.settled is None for r in rows)


def test_pipeline_end_to_end_and_idempotence(spark, warehouse):
    batch = _batch(spark)
    stats1 = MED.run_pipeline(spark, warehouse, batch, run_ts="2025-01-05T00:00:00")
    assert stats1["bronze_appended"] > 0
    assert stats1["silver_tx"] == stats1["bronze_total"]
    assert stats1["silver_merchants"] > 0
    assert stats1["silver_counterparties"] > 0
    assert stats1["gold_rows"] > 0

    # same batch again → nothing changes anywhere (A11/A17 property)
    stats2 = MED.run_pipeline(spark, warehouse, batch, run_ts="2025-02-01T00:00:00")
    assert stats2["bronze_appended"] == 0
    for k in ("bronze_total", "silver_tx", "silver_counterparties", "silver_merchants", "gold_rows"):
        assert stats2[k] == stats1[k], k

    # silver rows were NOT re-stamped (SCD type 0: first version wins)
    stamps = {
        r.inserted_at.isoformat()
        for r in warehouse.read(MED.SILVER_TX).select("inserted_at").distinct().collect()
    }
    assert stamps == {"2025-01-05T00:00:00"}


def test_balance_and_pots_snapshot_log(spark, warehouse):
    """A12/A13 append-only snapshot semantics + A24 latest-read."""
    for run_idx, ts in enumerate(["2025-01-05T00:00:00", "2025-01-06T00:00:00"]):
        bal = ING.balance_snapshot_df(spark, ING.make_fake_balance(run_idx), ts)
        pots = ING.pots_snapshot_df(spark, ING.make_fake_pots(3, run_idx), ts)
        MED.load_snapshots(warehouse, bal, pots)

    # every run appends: 2 balance rows, 6 pot rows (3 pots x 2 runs)
    assert warehouse.read(MED.BRONZE_BALANCE).count() == 2
    assert warehouse.read(MED.BRONZE_POTS).count() == 6

    latest = MED.latest_balance(warehouse).collect()
    assert len(latest) == 1 and latest[0].balance == 121000  # run_idx=1
    lp = MED.latest_pots(warehouse).collect()
    assert len(lp) == 3
    assert all(r.date_retrieved.isoformat() == "2025-01-06T00:00:00" for r in lp)
    # pot boolean defaults filled (round_up_multiplier stays nullable)
    assert all(r.deleted is False for r in lp)


def test_incremental_batch_appends_only_new(spark, warehouse):
    b1 = _batch(spark, n_windows=2)
    MED.run_pipeline(spark, warehouse, b1, run_ts="2025-01-05T00:00:00")
    n1 = warehouse.read(MED.BRONZE_TX).count()

    b2 = _batch(spark, n_windows=3)  # superset: windows 1-2 overlap
    stats = MED.run_pipeline(spark, warehouse, b2, run_ts="2025-01-06T00:00:00")
    n2 = warehouse.read(MED.BRONZE_TX).count()
    assert stats["bronze_appended"] == n2 - n1 > 0

    # money semantics: silver amount is pounds decimal, bronze pence long
    bronze = warehouse.read(MED.BRONZE_TX).select("id", "amount").collect()
    silver = {r.id: r.amount for r in warehouse.read(MED.SILVER_TX).collect()}
    for r in bronze:
        assert silver[r.id] == round(__import__("decimal").Decimal(r.amount) / 100, 2)


def test_sql_path_transform_matches_dataframe_path(spark, tmp_path):
    """SURVEY §3.2: the SQL-script front end and the DataFrame path
    must produce byte-identical silver layers from the same bronze."""
    from monzo_data_pipeline_spark.pipeline import sql_path as SQLP

    batch = _batch(spark)
    wh_df = MED.Warehouse(spark, str(tmp_path / "wh_df"))
    wh_sql = MED.Warehouse(spark, str(tmp_path / "wh_sql"))
    for wh in (wh_df, wh_sql):
        MED.load_bronze(wh, batch)
    MED.transform_silver(wh_df, inserted_at="2025-01-05T00:00:00")
    SQLP.transform_silver_sql(wh_sql, inserted_at="2025-01-05T00:00:00")

    for table in (MED.SILVER_TX, MED.SILVER_CP, MED.SILVER_ME):
        a = wh_df.read(table)
        b = wh_sql.read(table)
        assert a.schema == b.schema, table
        ra = sorted(map(str, a.collect()))
        rb = sorted(map(str, b.collect()))
        assert ra == rb, table


def test_split_sql_script_respects_quotes_and_comments():
    from monzo_data_pipeline_spark.pipeline.sql_path import split_sql_script

    script = (
        "SELECT 'a;b' AS s; -- trailing; comment\n"
        "SELECT 1;\n"
        "-- a full comment line; with semicolon\n"
        "SELECT 2"
    )
    stmts = split_sql_script(script)
    assert len(stmts) == 3
    assert "'a;b'" in stmts[0] and "SELECT 2" in stmts[2]
