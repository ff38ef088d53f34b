"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares:
  * row count,
  * column names (sorted),
  * an order-insensitive value hash (rows canonicalized to strings,
    sorted, md5'd).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from monzo_data_pipeline_spark.registry import specs  # noqa: E402
from monzo_data_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from monzo_data_pipeline_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted("|".join(canon(r[i]) for i in col_order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for spec in specs():
        if only and spec.name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {spec.name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {spec.name}: {len(srows)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {spec.name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            s_order = [scols.index(c) for c in sorted(scols)]
            o_order = [ocols.index(c) for c in sorted(ocols)]
            sh = table_hash(srows, s_order)
            oh = table_hash(orows, o_order)
            if sh != oh:
                problems.append("value-hash mismatch")
                s_set = sorted(
                    "|".join(canon(r[i]) for i in s_order) for r in srows
                )
                o_set = sorted(
                    "|".join(canon(r[i]) for i in o_order) for r in orows
                )
                diff = [
                    (a, b) for a, b in zip(s_set, o_set) if a != b
                ][:3]
                for a, b in diff:
                    problems.append(f"  spark={a!r}")
                    problems.append(f"  duck ={b!r}")
        if problems:
            print(f"FAIL  {spec.name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {spec.name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
