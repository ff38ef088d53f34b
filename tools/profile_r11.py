"""Round-11 optimization profiler (guide §1: measure first).

Extends tools/profile_r10.py with the load-insensitive structural
metrics this round's decisions hinge on:
  * jobs      — Spark job count per call (statusTracker delta):
                driver-scheduling cost, immune to neighbor load
  * spin      — 0.25 s single-thread spin calibration before each
                query (kiters/s) so wall numbers can be load-normalized
  * noop_s / topandas_s — min over N runs, as in r10

Usage:
    python tools/profile_r11.py [--explain SUFFIX] [--runs N]
                                [--json OUT] [q ...]
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


def _spin(secs: float = 0.25) -> int:
    t0 = time.time()
    n = 0
    x = 0
    while time.time() - t0 < secs:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) % 2_147_483_648
        n += 1
    return int(n * 10 / secs)


def _job_count(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain", default=None, metavar="SUFFIX",
                    help="dump explain('formatted') to plans/r11/<q>_<SUFFIX>.txt")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", default=None, help="write results to this JSON file")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r11")
    sel = [s for s in specs() if not args.queries or s.name in args.queries]
    if args.queries:
        missing = set(args.queries) - {s.name for s in sel}
        if missing:
            raise SystemExit(f"unknown queries: {sorted(missing)}")

    plans_dir = os.path.join(REPO, "plans", "r11")
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

        # job count on a warm, isolated call (noop sink)
        j0 = _job_count(spark)
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        jobs = _job_count(spark) - j0
        _free_state(spark)

        spin = _spin()
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
            "jobs": jobs,
            "spin": spin,
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
