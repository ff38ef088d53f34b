"""Multi-process chaos test for the atomic warehouse (VERDICT r3 #5):
N concurrent writer PROCESSES × M commits each, some SIGKILLed
mid-run, a vacuum(retain_last) interleaved — then audit that

  * no recorded-successful commit was lost (the flock'd check-and-swap
    means two processes can never both win the same version),
  * the surviving snapshot contains only rows some writer attempted,
    each exactly once (no duplicated dirs, no partial dirs),
  * archived manifests form a strict append lineage (each version's
    dir list extends its predecessor's), with no phantom snapshot
    beyond the committed pointer,
  * vacuum under retain_last keeps every retained snapshot readable.

The writers are Spark-free (pyarrow + append_parquet_dir), so the test
exercises real cross-process interleaving at high commit frequency
instead of three JVMs politely taking turns.
"""

from __future__ import annotations

import json
import os
import random
import signal
import subprocess
import sys
import time

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.pipeline.atomic import AtomicWarehouse  # noqa: E402

WRITER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "chaos_writer.py")


def _read_rows(root: str) -> list[tuple[int, int, int]]:
    """Read the surviving snapshot without Spark (duckdb over the
    manifest's dir list — the same resolution path wh.read takes)."""
    wh = AtomicWarehouse(None, root)
    dirs = wh.manifest()["tables"].get("tx", [])
    if not dirs:
        return []
    files = [
        os.path.join(wh._abs(d), n)
        for d in dirs
        for n in sorted(os.listdir(wh._abs(d)))
        if n.endswith(".parquet")
    ]
    con = duckdb.connect()
    rows = con.sql(
        "SELECT writer, seq, row FROM read_parquet($files) ORDER BY 1, 2, 3",
        params={"files": files},
    ).fetchall()
    con.close()
    return [tuple(map(int, r)) for r in rows]


@pytest.mark.parametrize("seed", [7, 23])
def test_concurrent_writers_with_kills_never_lose_or_duplicate(tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / "wh")
    n_writers, n_commits = 4, 12
    kill_targets = set(rng.sample(range(n_writers), 2))

    procs, logs = {}, {}
    for w in range(n_writers):
        log = str(tmp_path / f"log{w}.csv")
        logs[w] = log
        procs[w] = subprocess.Popen(
            [sys.executable, WRITER, root, str(w), str(n_commits), log],
        )

    # let everyone get going, then SIGKILL the victims mid-commit
    time.sleep(0.6 + rng.random() * 0.6)
    for w in kill_targets:
        if procs[w].poll() is None:
            os.kill(procs[w].pid, signal.SIGKILL)
    for w, p in procs.items():
        p.wait(timeout=120)
    for w in range(n_writers):
        if w not in kill_targets:
            assert procs[w].returncode == 0, f"writer {w} failed"

    # ground truth: commits each worker recorded AFTER commit returned
    recorded = set()
    for w, log in logs.items():
        if os.path.exists(log):
            for line in open(log):
                wid, seq = line.strip().split(",")
                recorded.add((int(wid), int(seq)))

    rows = _read_rows(root)
    present = {(w, s) for w, s, _ in rows}

    # 1) no lost updates: every recorded commit survives in full
    missing = recorded - present
    assert not missing, f"lost committed batches: {sorted(missing)}"
    # 2) no duplication/partials: each present batch is exactly 3 rows
    from collections import Counter

    per_batch = Counter((w, s) for w, s, _ in rows)
    bad = {k: c for k, c in per_batch.items() if c != 3}
    assert not bad, f"duplicated or partial batches: {bad}"
    # killed writers may have committed more than they recorded (death
    # between swap and log write) — allowed; unkilled writers' presence
    # must equal their records exactly
    for w in range(n_writers):
        if w not in kill_targets:
            got = {s for (wid, s) in present if wid == w}
            assert got == set(range(n_commits)), f"writer {w}: {sorted(got)}"

    # 3) lineage audit: archived manifests strictly extend one another,
    # none beyond the committed pointer (no phantom snapshots)
    wh = AtomicWarehouse(None, root)
    cur = wh.manifest()
    hist = os.path.join(root, "_manifests")
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(hist)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    )
    assert versions[-1] <= cur["version"], "phantom snapshot beyond pointer"
    by_v = {}
    for v in versions:
        with open(os.path.join(hist, f"v{v}.json")) as f:
            by_v[v] = json.load(f)
        assert by_v[v]["version"] == v
    for a, b in zip(versions, versions[1:]):
        if b == a + 1:  # consecutive commits: append-only dir lineage
            da = set(by_v[a]["tables"].get("tx", []))
            db = set(by_v[b]["tables"].get("tx", []))
            assert da < db, f"v{a} not a strict subset of v{b}"

    # 4) vacuum with a retention window: every retained snapshot stays
    # readable, the current one always
    removed = wh.vacuum(retain_last=2, min_age_seconds=0)
    assert _read_rows(root), "current snapshot unreadable after vacuum"
    keep = sorted(
        int(f[1:-5])
        for f in os.listdir(hist)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    )
    assert len(keep) == 2
    for v in keep:
        with open(os.path.join(hist, f"v{v}.json")) as f:
            man = json.load(f)
        for rel in man["tables"].get("tx", []):
            assert os.path.isdir(os.path.join(root, rel)), (
                f"retained v{v} references vacuumed dir {rel}"
            )
    # swept data dirs must be true orphans (conflict-aborted stagings,
    # killed writers' leftovers) — never anything the current or a
    # retained manifest references
    still_live = set(wh.manifest()["tables"].get("tx", []))
    for v in keep:
        with open(os.path.join(hist, f"v{v}.json")) as f:
            still_live |= set(json.load(f)["tables"].get("tx", []))
    swept_dirs = {r for r in removed if r.startswith("tx/")}
    assert not (swept_dirs & still_live), swept_dirs & still_live


def test_vacuum_concurrent_with_live_writers_is_safe(tmp_path):
    """vacuum() with the default staleness horizon must be safe WHILE
    writers are mid-flight: an unreferenced dir can be an in-flight
    transaction's staging (the manifest only learns of it at commit),
    and a fresh _manifest.json.tmp.<pid> belongs to a commit between
    fsync and rename — the horizon keeps vacuum's hands off both. This
    is the interleaving the r4 review flagged: without the horizon a
    concurrent vacuum deletes the staged dir and the commit lands
    pointing at missing data."""
    root = str(tmp_path / "wh")
    n_writers, n_commits = 3, 10
    procs = []
    logs = []
    for w in range(n_writers):
        log = str(tmp_path / f"log{w}.csv")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, WRITER, root, str(w), str(n_commits), log],
            )
        )
    wh = AtomicWarehouse(None, root)
    # hammer vacuum the whole time the writers run
    while any(p.poll() is None for p in procs):
        if os.path.exists(os.path.join(root, "_manifest.json")):
            wh.vacuum(retain_last=1)  # default horizon: stagings protected
        time.sleep(0.02)
    for p in procs:
        p.wait(timeout=60)
        assert p.returncode == 0, "a writer died during concurrent vacuum"

    recorded = set()
    for w, log in enumerate(logs):
        for line in open(log):
            wid, seq = line.strip().split(",")
            recorded.add((int(wid), int(seq)))
    assert len(recorded) == n_writers * n_commits
    rows = _read_rows(root)
    present = {(w, s) for w, s, _ in rows}
    assert recorded == present  # nothing lost, nothing extra
    from collections import Counter

    per_batch = Counter((w, s) for w, s, _ in rows)
    assert all(c == 3 for c in per_batch.values())
