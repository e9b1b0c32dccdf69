#!/usr/bin/env python
"""Isolated per-query timing with job-level breakdown.

Usage: python scripts/profile_queries.py <query> [query ...]
       python scripts/profile_queries.py --top N       # N slowest from BENCH_FULL.json

For each query: warm at sf0.001, then time min-of-3 noop-sink runs at
$SPARK_GRAFT_SF_DIR (default sf0.1), and report the number of Spark
jobs/stages/tasks the run launched (via a SparkListener) — the
iterative queries' cost at small SF is mostly fixed per-job overhead,
so job count is the first thing to check before blaming shuffles.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1])
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json")) as f:
            bench = json.load(f)
        names = [
            q
            for q, _ in sorted(
                bench["queries"].items(), key=lambda x: -x[1]
            )[:n]
        ]
    else:
        names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_profile")
    sc = spark.sparkContext

    tracker = sc.statusTracker()

    warm_dir = "/root/testdata/sf0.001"
    results = {}
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        gc.collect()
        best = None
        jobs_delta = None
        for _ in range(3):
            j0 = tracker.getJobIdsForGroup(None)
            n_jobs0 = max(j0) if j0 else -1
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            j1 = tracker.getJobIdsForGroup(None)
            n_jobs1 = max(j1) if j1 else -1
            if best is None or t < best:
                best = t
                jobs_delta = n_jobs1 - n_jobs0
            gc.collect()
        results[name] = {"sec": round(best, 3), "jobs": jobs_delta}
        print(f"{best:8.3f}s  {jobs_delta:4d} jobs  {name}", flush=True)

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
