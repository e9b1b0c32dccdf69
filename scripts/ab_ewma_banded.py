#!/usr/bin/env python
"""Interleaved ABBA A/B: ewma_bounded default (k-LAG window) vs banded
contribution-explode at the contract query's shape and scale.

Usage: python scripts/ab_ewma_banded.py [n_reps]
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from betl_spark.contract.common import table, ts_micros
    from betl_spark.contract.round10 import EWMA_ALPHA, EWMA_K
    from betl_spark.operators import timeseries
    from betl_spark.session import build_spark

    spark = build_spark("ab_ewma_banded")
    bands = int(os.environ.get("AB_BANDS", 4 * spark.sparkContext.defaultParallelism))

    def build(n_bands):
        ev = table(spark, sf_dir, "events")
        ev = ev.withColumn("__ts_us", ts_micros(ev))
        return timeseries.ewma_bounded(
            ev, "event_type", "__ts_us", "event_id", "value",
            alpha=EWMA_ALPHA, k=EWMA_K, n_bands=n_bands,
        )

    # parity first: the two strategies must emit the same rows
    a, b = build(None), build(bands)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"exceptAll parity: {d1}/{d2} (must be 0/0)")
    if d1 or d2:
        return 1

    def run(n_bands):
        gc.collect()
        t0 = time.perf_counter()
        build(n_bands).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both
    run(None)
    run(bands)
    ta, tb = [], []
    for i in range(reps // 2):
        ta.append(run(None))
        tb.append(run(bands))
        tb.append(run(bands))
        ta.append(run(None))
    fmt = lambda ts: f"min {min(ts):.3f}s med {statistics.median(ts):.3f}s"
    print(f"default (LAG window, {reps} reps): {fmt(ta)}")
    print(f"banded  (B={bands}, {reps} reps):  {fmt(tb)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
