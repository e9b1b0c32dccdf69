#!/usr/bin/env python
"""Capture .explain("formatted") for contract queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <out_dir> [query ...]

With no query names, captures every contract query. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.1) — same data the bench times, so
the plan shapes (broadcast thresholds, AQE initial plans) match what
the bench executes. Capture is analysis-only (no job runs) except for
eager checkpoints inside operators; queries that raise during analysis
are recorded with the error.

Round-15 addition (r14 verdict ask #9): every ``localCheckpoint`` a
query takes truncates its downstream plan at ``Scan ExistingRDD``, so
the committed dumps could not show e.g. the similarity grid join that
the optimization claims rest on. During capture, ``localCheckpoint``
is wrapped to FIRST dump the checkpointed subframe's own formatted
plan; the sections are appended to the query's plan file as
``=== pre-checkpoint subplan #N ===`` blocks, in checkpoint order.
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
    # the CONCRETE DataFrame class: in Spark 4 pyspark.sql.DataFrame is
    # the abstract base and the classic implementation overrides
    # localCheckpoint, so the base-class attribute is never dispatched
    DataFrame = type(spark.range(1))

    def fmt(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # wrap localCheckpoint so each checkpointed subframe's plan is
    # captured before the lineage is cut (see module docstring)
    subplans: list[str] = []
    orig_ckpt = DataFrame.localCheckpoint

    def capturing_ckpt(self, *args, **kwargs):
        try:
            subplans.append(fmt(self))
        except Exception as exc:  # noqa: BLE001
            subplans.append(f"ERROR during subplan capture: {exc!r}\n")
        return orig_ckpt(self, *args, **kwargs)

    DataFrame.localCheckpoint = capturing_ckpt
    try:
        todo = names or sorted(QUERIES)
        for name in todo:
            fn = QUERIES[name]
            path = os.path.join(out_dir, f"{name}.txt")
            subplans.clear()
            try:
                df = fn(spark, sf_dir)
                plan = fmt(df)
            except Exception as exc:  # noqa: BLE001
                plan = f"ERROR during plan capture: {exc!r}\n"
            parts = [plan]
            for i, sp in enumerate(subplans, 1):
                parts.append(f"\n\n=== pre-checkpoint subplan #{i} ===\n\n")
                parts.append(sp)
            with open(path, "w") as f:
                f.write("".join(parts))
            print(name, "->", path, flush=True)
    finally:
        DataFrame.localCheckpoint = orig_ckpt
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
