#!/usr/bin/env python
"""Capture .explain("formatted") for contract queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <out_dir> [query ...]

With no query names, captures every contract query. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.1) — same data the bench times, so
the plan shapes (broadcast thresholds, AQE initial plans) match what
the bench executes. Capture is analysis-only (no job runs), so it is
cheap; queries that raise during analysis are recorded with the error.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from betl_spark.contract import QUERIES
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_plans")

    todo = names or sorted(QUERIES)
    for name in todo:
        fn = QUERIES[name]
        path = os.path.join(out_dir, f"{name}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR during plan capture: {exc!r}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(name, "->", path, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
