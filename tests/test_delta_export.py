"""Delta-interop export (pipeline/delta_export.py, r10): the
AtomicWarehouse manifest history re-published as a `_delta_log` JSON
action log, proven readable from the written format alone (the
spec-only replay reader — no jars) and equivalent to the manifest on
commit / erase / vacuum histories."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from monzo_data_pipeline_spark.pipeline.atomic import (  # noqa: E402
    AtomicWarehouse,
)
from monzo_data_pipeline_spark.pipeline.delta_export import (  # noqa: E402
    export_delta_log,
    read_delta_table,
)


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(int(x),) for x in vals], f"{col} bigint")


def _vals(df, col="v"):
    return sorted(r[col] for r in df.collect())


@pytest.fixture()
def wh(spark, tmp_path):
    return AtomicWarehouse(spark, str(tmp_path / "wh"))


def test_round_trip_every_version(wh, spark):
    """Append / append / overwrite history: each exported Delta
    version replays to exactly the matching manifest snapshot."""
    wh.append(_df(spark, [1, 2]), "t")
    wh.append(_df(spark, [3]), "t")
    wh.overwrite(_df(spark, [7, 8, 9]), "t")
    tdir = export_delta_log(wh, "t")

    assert _vals(read_delta_table(spark, tdir)) == [7, 8, 9]
    assert _vals(read_delta_table(spark, tdir, version=0)) == [1, 2]
    assert _vals(read_delta_table(spark, tdir, version=1)) == [1, 2, 3]
    assert _vals(read_delta_table(spark, tdir, version=2)) == [7, 8, 9]
    # and each matches the warehouse's own time travel
    for delta_v, man_v in ((0, 1), (1, 2), (2, 3)):
        assert _vals(read_delta_table(spark, tdir, version=delta_v)) == (
            _vals(wh.read_version("t", man_v))
        )


def test_log_structure_is_protocol_v1(wh, spark):
    """The first commit file carries protocol + metaData + adds; a
    later overwrite carries removes + adds; every add has the spec's
    required fields and numRecords stats."""
    wh.append(_df(spark, [1, 2, 3]), "t")
    wh.overwrite(_df(spark, [4]), "t")
    tdir = export_delta_log(wh, "t")
    log = os.path.join(tdir, "_delta_log")
    names = sorted(os.listdir(log))
    assert names == [f"{0:020d}.json", f"{1:020d}.json"]

    def actions(name):
        with open(os.path.join(log, name)) as f:
            return [json.loads(line) for line in f if line.strip()]

    first = actions(names[0])
    assert first[0]["protocol"] == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    meta = first[1]["metaData"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["v"]
    adds = [a["add"] for a in first if "add" in a]
    assert adds and sum(
        json.loads(a["stats"])["numRecords"] for a in adds
    ) == 3
    for a in adds:
        assert not os.path.isabs(a["path"])
        assert a["dataChange"] is True
        assert a["size"] > 0 and a["modificationTime"] > 0
        assert os.path.exists(os.path.join(tdir, a["path"]))

    second = actions(names[1])
    removed = {a["remove"]["path"] for a in second if "remove" in a}
    assert removed == {a["path"] for a in adds}  # overwrite drops all
    assert any("add" in a for a in second)
    assert not any("protocol" in a for a in second)


def test_erasure_history_exports_removes(wh, spark):
    """replace_dirs (the erasure primitive) surfaces as remove+add of
    only the rewritten dir's files; untouched dirs' files are never
    re-added (byte-identical snapshot sharing across versions)."""
    wh.append(_df(spark, [1, 2]), "t")
    wh.append(_df(spark, [3, 4]), "t")
    dirs = wh.manifest()["tables"]["t"]
    with wh.transaction() as txn:
        victim = dirs[0]
        kept = txn.read("t").filter(F.col("v") != 1)
        # rewrite only the first dir (drop value 1), keep the second
        rewritten = wh.spark.read.parquet(wh._abs(victim)).filter(
            F.col("v") != 1
        )
        txn.replace_dirs("t", [victim], rewritten)
        del kept
    tdir = export_delta_log(wh, "t")
    assert _vals(read_delta_table(spark, tdir)) == [2, 3, 4]
    with open(
        os.path.join(tdir, "_delta_log", f"{2:020d}.json")
    ) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    removed = {a["remove"]["path"] for a in acts if "remove" in a}
    added = {a["add"]["path"] for a in acts if "add" in a}
    # untouched dir's files appear in neither set
    untouched_prefix = dirs[1].split("/", 1)[1]
    assert not any(p.startswith(untouched_prefix) for p in removed | added)
    assert removed and added


def test_vacuum_then_reexport_rebases_to_current(wh, spark):
    """After vacuum truncates history, a re-export publishes a fresh
    single-commit log of the current snapshot (delta version 0) and
    the old log files are gone — the log is derived state."""
    wh.append(_df(spark, [1]), "t")
    wh.overwrite(_df(spark, [2, 3]), "t")
    export_delta_log(wh, "t")
    wh.vacuum(min_age_seconds=0)
    tdir = export_delta_log(wh, "t")
    names = sorted(os.listdir(os.path.join(tdir, "_delta_log")))
    assert names == [f"{0:020d}.json"]
    assert _vals(read_delta_table(spark, tdir)) == [2, 3]


def test_multi_table_commit_exports_per_table(wh, spark):
    with wh.transaction() as txn:
        txn.overwrite(_df(spark, [1]), "a")
        txn.overwrite(_df(spark, [2]), "b")
    ta = export_delta_log(wh, "a")
    tb = export_delta_log(wh, "b")
    assert _vals(read_delta_table(spark, ta)) == [1]
    assert _vals(read_delta_table(spark, tb)) == [2]
    with pytest.raises(FileNotFoundError):
        export_delta_log(wh, "missing")


def test_schema_change_emits_new_metadata(wh, spark):
    wh.overwrite(_df(spark, [1]), "t")
    wh.overwrite(
        _df(spark, [2]).withColumn("extra", F.lit("x")), "t"
    )
    tdir = export_delta_log(wh, "t")
    with open(
        os.path.join(tdir, "_delta_log", f"{1:020d}.json")
    ) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    metas = [a["metaData"] for a in acts if "metaData" in a]
    assert len(metas) == 1
    fields = [
        f["name"]
        for f in json.loads(metas[0]["schemaString"])["fields"]
    ]
    assert fields == ["v", "extra"]
    got = read_delta_table(spark, tdir)
    assert got.columns == ["v", "extra"]
    assert _vals(got) == [2]


def test_import_delta_table_round_trip(wh, spark, tmp_path):
    """Export from warehouse A, import into warehouse B through the
    transactional commit: rows equal at the latest AND a historical
    version; staged files are copies (no shared inodes with the
    source); re-import replaces the snapshot."""
    import os as _os

    from monzo_data_pipeline_spark.pipeline.delta_export import (
        import_delta_table,
    )

    wh.append(_df(spark, [1, 2]), "t")
    wh.overwrite(_df(spark, [7, 8, 9]), "t")
    tdir = export_delta_log(wh, "t")

    dst = AtomicWarehouse(spark, str(tmp_path / "wh_b"))
    n = import_delta_table(dst, tdir, "mirror")
    assert n >= 1
    assert _vals(dst.read("mirror")) == [7, 8, 9]

    # historical snapshot import
    dst2 = AtomicWarehouse(spark, str(tmp_path / "wh_c"))
    import_delta_table(dst2, tdir, "mirror", version=0)
    assert _vals(dst2.read("mirror")) == [1, 2]

    # no inode sharing with the source table
    src_inodes = {
        _os.stat(_os.path.join(dp, f)).st_ino
        for dp, _, fs in _os.walk(tdir)
        for f in fs
        if f.endswith(".parquet")
    }
    dst_root = str(tmp_path / "wh_b")
    dst_inodes = {
        _os.stat(_os.path.join(dp, f)).st_ino
        for dp, _, fs in _os.walk(dst_root)
        for f in fs
        if f.endswith(".parquet")
    }
    assert not (src_inodes & dst_inodes)

    # source advances; re-import replaces, not merges
    wh.overwrite(_df(spark, [42]), "t")
    import_delta_table(dst, export_delta_log(wh, "t"), "mirror")
    assert _vals(dst.read("mirror")) == [42]
