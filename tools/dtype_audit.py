"""Pandas-dtype parity audit — the failure mode the collect()-based
oracle_check cannot see.

The driver compares Spark ``toPandas()`` output against DuckDB
``.df()`` output; a value-equal result still hash-mismatches when the
pandas dtypes differ (Spark DECIMAL -> object[Decimal] vs DuckDB
DECIMAL -> float64; DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs Spark
sum -> int64; int32 vs int64; ...).  This tool flags every query whose
column dtypes differ between the two engines.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from monzo_data_pipeline_spark.registry import specs  # noqa: E402
from monzo_data_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from monzo_data_pipeline_spark.session import get_spark  # noqa: E402


def norm(dtype) -> str:
    s = str(dtype)
    # datetime64[us] vs datetime64[ns]: both engines store micro-precision
    # values; unit difference alone does not change the value set.
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_ok = n_bad = 0
    for spec in specs():
        if only and spec.name not in only:
            continue
        if spec.oracle is None:
            continue
        t0 = time.time()
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            opdf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {spec.name}: {e}")
            n_bad += 1
            continue
        sdt = {c: norm(d) for c, d in spdf.dtypes.items()}
        odt = {c: norm(d) for c, d in opdf.dtypes.items()}
        diffs = []
        for c in sorted(set(sdt) | set(odt)):
            if sdt.get(c) != odt.get(c):
                diffs.append(f"{c}: spark={sdt.get(c)} duck={odt.get(c)}")
        # object columns with equal dtype can still hold different Python
        # types (Decimal vs str vs list) — compare first non-null values.
        for c in sorted(set(sdt) & set(odt)):
            if sdt[c] == "object" and len(spdf) and len(opdf):
                sv = spdf[c].dropna()
                ov = opdf[c].dropna()
                if len(sv) and len(ov):
                    st, ot = type(sv.iloc[0]).__name__, type(ov.iloc[0]).__name__
                    if st != ot:
                        diffs.append(f"{c}: object types spark={st} duck={ot}")
        if diffs:
            print(f"DTYPE {spec.name}: " + "; ".join(diffs) + f" [{time.time()-t0:.1f}s]")
            n_bad += 1
        else:
            n_ok += 1

    print(f"\n{n_ok} dtype-clean, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
