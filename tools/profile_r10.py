"""Round-10 optimization profiler (guide §1: measure first).

For each named query (default: all), isolated from the suite:
  * build_s   — DataFrame construction time (Catalyst analysis of the
                logical plan; driver-side, single-threaded)
  * noop_s    — min over N runs of the noop-sink write (guide §1.4:
                computes every column of every row, no Arrow retrieval)
  * topandas_s— min over N runs of toPandas() (the bench's timed action)
and optionally dumps .explain('formatted') to plans/<tag>/<q>_<suffix>.txt.

Usage:
    python tools/profile_r10.py [--explain SUFFIX] [--runs N] [q ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.registry import specs  # noqa: E402
from monzo_data_pipeline_spark.session import get_spark  # noqa: E402


def _free_state(spark) -> None:
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist(False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain", default=None, metavar="SUFFIX",
                    help="dump explain('formatted') to plans/r10/<q>_<SUFFIX>.txt")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", default=None, help="write results to this JSON file")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r10")
    sel = [s for s in specs() if not args.queries or s.name in args.queries]
    if args.queries:
        missing = set(args.queries) - {s.name for s in sel}
        if missing:
            raise SystemExit(f"unknown queries: {sorted(missing)}")

    plans_dir = os.path.join(REPO, "plans", "r10")
    if args.explain:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict[str, float]] = {}
    for spec in sel:
        spark.sparkContext.setJobDescription(f"profile:{spec.name}")
        # warmup + plan-build timing
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        build_s = time.time() - t0
        df.write.format("noop").mode("overwrite").save()  # warmup exec
        _free_state(spark)

        noop_s = []
        for _ in range(args.runs):
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            noop_s.append(time.time() - t0)
            _free_state(spark)
        tp_s = []
        for _ in range(args.runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).toPandas()
            tp_s.append(time.time() - t0)
            _free_state(spark)

        rec = {
            "build_s": round(build_s, 3),
            "noop_s": round(min(noop_s), 3),
            "topandas_s": round(min(tp_s), 3),
        }
        out[spec.name] = rec
        print(json.dumps({"query": spec.name, **rec}), flush=True)

        if args.explain:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spec.fn(spark, sf_dir).explain("formatted")
            with open(
                os.path.join(plans_dir, f"{spec.name}_{args.explain}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            _free_state(spark)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
