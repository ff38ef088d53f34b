"""Spark-free chaos-test worker for the atomic warehouse: commits M
appends (each one pyarrow-written parquet dir staged via
append_parquet_dir) with retry-on-conflict, recording every commit the
moment it returns. The parent (tests/test_atomic_chaos.py) runs N of
these concurrently and SIGKILLs some mid-run; the recorded-success
files are the ground truth the surviving warehouse is audited against.

Usage: python chaos_writer.py <wh_root> <writer_id> <n_commits> <log>
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from monzo_data_pipeline_spark.pipeline.atomic import (  # noqa: E402
    AtomicWarehouse,
    ConflictError,
)


def main() -> int:
    root, writer_id, n_commits, log_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    wh = AtomicWarehouse(None, root)  # no Spark: manifest ops + staging only
    for seq in range(n_commits):
        with tempfile.TemporaryDirectory() as src:
            tbl = pa.table(
                {
                    "writer": pa.array([writer_id] * 3, pa.int64()),
                    "seq": pa.array([seq] * 3, pa.int64()),
                    "row": pa.array(list(range(3)), pa.int64()),
                }
            )
            pq.write_table(tbl, os.path.join(src, "part-0.parquet"))
            while True:
                try:
                    with wh.transaction() as txn:
                        # link=True is safe here (the staging dir is
                        # deleted right after commit, never modified in
                        # place) and keeps the hardlink path under test
                        txn.append_parquet_dir(src, "tx", link=True)
                    break
                except ConflictError:
                    continue  # retry on the new snapshot
        # record success ONLY after the commit returned; append+fsync so
        # a later kill cannot lose the record
        with open(log_path, "a") as f:
            f.write(f"{writer_id},{seq}\n")
            f.flush()
            os.fsync(f.fileno())
    return 0


if __name__ == "__main__":
    sys.exit(main())
