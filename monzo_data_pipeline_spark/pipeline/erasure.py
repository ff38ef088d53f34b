"""Right-to-be-forgotten (GDPR Art. 17) erasure across warehouse layers.

The reference keeps personal finance data in three medallion layers of
one SQLite file — a DELETE there is a one-liner. On an immutable
parquet lake, erasure is a rewrite: anti-join every table that carries
the subject key and atomically swap the rewritten files in. For an
LLM-training corpus this is the same operator that removes opted-out
or licensed-out documents before a training run.

Scale posture:
  * The erase set is broadcast (it is tiny relative to the lake) and
    the anti-join is map-side against each table scan.
  * Here every table is rewritten wholesale; at 100 TB you would prune
    the rewrite to the partitions whose min/max key stats (or bloom
    filters — sources/io.py writes them) can contain the keys, and on
    Delta/Iceberg you'd issue a metadata DELETE instead. The operator
    interface (keys in, per-table removal report out) is unchanged.
  * The swap is write-temp → two atomic renames (current → .__old__,
    tmp → current) → delete .__old__, so at every instant the table
    path either is the old snapshot or the new one — a crash
    mid-erasure never leaves a half-deleted or missing directory.
    Recovery from a crash between the two renames is picking up the
    .__old__ dir; recovery after the second rename is nothing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .medallion import Warehouse


def erase_keys(
    wh: Warehouse,
    ids: DataFrame,
    key: str,
    tables: list[str],
) -> dict[str, int]:
    """Remove every row whose `key` is in `ids` from each listed table.

    Tables lacking the key column are skipped (reported as -1);
    re-running with the same ids is a no-op. Returns rows removed per
    table.
    """
    erase_set = F.broadcast(ids.select(key).distinct())
    report: dict[str, int] = {}
    for table in tables:
        if not wh.exists(table):
            continue
        df = wh.read(table)
        if key not in df.columns:
            report[table] = -1
            continue
        kept = df.join(erase_set, key, "left_anti")
        final = wh.path(table)
        tmp = final + ".__erase_rewrite__"
        old = final + ".__old__"
        kept.write.mode("overwrite").parquet(tmp)
        n_before = df.count()  # original files still on disk here
        # two renames, each atomic: the table dir always exists and is
        # always a consistent snapshot (old or new) — rmtree only ever
        # touches the retired copy
        if os.path.exists(old):
            shutil.rmtree(old)  # leftover from a prior crash
        os.replace(final, old)
        os.replace(tmp, final)
        shutil.rmtree(old)
        report[table] = n_before - wh.read(table).count()
    return report


def erase_keys_atomic(wh, ids: DataFrame, key: str, tables: list[str]) -> dict[str, int]:
    """Erasure across ALL tables in ONE commit (AtomicWarehouse).

    The per-table variant above leaves a window where table A is
    already scrubbed but table B still holds the subject — fine for
    eventual compliance, wrong for a consistent audit snapshot. Here
    every rewritten table flips in the same manifest swap: an auditor
    reading at any instant sees the subject everywhere or nowhere.
    Old versions remain on disk until vacuum() — complete erasure =
    this commit + vacuum, both idempotent.
    """
    erase_set = F.broadcast(ids.select(key).distinct())
    report: dict[str, int] = {}
    with wh.transaction() as txn:
        for table in tables:
            if not txn.exists(table):
                continue
            df = txn.read(table)
            if key not in df.columns:
                report[table] = -1
                continue
            n_before = df.count()
            txn.overwrite(df.join(erase_set, key, "left_anti"), table)
            report[table] = n_before - txn.read(table).count()
    return report


def pseudonymize_columns(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """GDPR pseudonymization (Art. 4(5)): replace identifier columns
    with salted deterministic tokens — consistent across tables (joins
    still work), irreversible without the salt, NULLs preserved.

    Token = 'anon_<h131>_<h137>': TWO independent polynomial folds of
    salt|value (bases 131 and 137, each mod 2³¹−1) — engine-agnostic,
    so pseudonymized outputs are oracle-checkable cross-engine unlike
    xxhash64/sha tokens, and the combined ~62-bit space keeps the
    birthday collision risk negligible at banking scale (~10⁻⁷ for
    10⁶ subjects; a single 2³¹ fold would already collide at ~5·10⁴).
    The salt rotates per purpose/recipient: different exports never
    correlate. Pure map-side column expressions, no shuffle.

    Companion to erase_keys: erasure removes the subject; this keeps
    analytic utility while removing identifiability.
    """
    from pyspark.sql import functions as F

    def fold(s, base: int):
        codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * base + x) % 2147483647,
        )

    out = df
    for c in cols:
        s = F.concat(F.lit(salt + "|"), F.col(c).cast("string"))
        token = F.when(
            F.col(c).isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.concat(
                F.lit("anon_"),
                fold(s, 131).cast("string"),
                F.lit("_"),
                fold(s, 137).cast("string"),
            )
        )
        out = out.withColumn(c, token)
    return out
