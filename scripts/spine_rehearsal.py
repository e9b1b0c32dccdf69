"""Key-cardinality-stretched spine rehearsal (round-9 verdict ask #5).

The round-9 rehearsal stretched the TIMELINE (sf1 = 10x events over a
longer range) and showed the global gap-fill spine growing 100x while
cost grew 3.8x. The complementary stretch — the one the observed-range
mode exists for — is KEY CARDINALITY: same events, user_id remapped to
~|events|/2 distinct keys, so most keys have 2 events and a short
observed span while the global rectangle explodes to
|keys| x |global range|.

This script builds the stretched replica from .scale/sf1 (remap
user_id := event_id % (n/2), written once under .scale/keystretch/),
then times daily resample_gapfill in both spine modes (min-of-2,
noop sink) and reports the spine cardinalities alongside, plus the
max_spine_rows guard firing on the rectangle.

Run: PYTHONPATH=/root/repo python scripts/spine_rehearsal.py
Paste the table into SCALE.md ("Round-10 spine rehearsal").
"""

from __future__ import annotations

import gc
import os
import time

from pyspark.sql import functions as F

from betl_spark.operators import timeseries
from betl_spark.session import build_spark

SF1 = "/root/repo/.scale/sf1"
OUT = "/root/repo/.scale/keystretch"


def time_run(df_fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        gc.collect()
    return best


def main() -> None:
    spark = build_spark()
    src = spark.read.parquet(f"{SF1}/events.parquet")
    n = src.count()
    n_keys = n // 2
    if not os.path.isdir(OUT):
        (
            src.withColumn(
                "user_id", F.col("event_id") % F.lit(int(n_keys))
            )
            .write.mode("overwrite")
            .parquet(OUT)
        )
    from betl_spark.contract.common import ts_micros

    base = spark.read.parquet(OUT)
    base = base.withColumn("__ts_us", ts_micros(base))
    b = base.agg(
        F.min("__ts_us").alias("lo"), F.max("__ts_us").alias("hi")
    ).collect()[0]
    slice_us = max(1, (int(b["hi"]) - int(b["lo"]) + 1) // int(n_keys))

    scenarios = {
        # random long-lived keys: each key's observed span covers most
        # of the timeline, so observed ~ global (and pays an extra
        # shuffle for the per-key bounds)
        "long-lived": base,
        # short-lived keys (sessions, ephemeral entities): each key
        # exists for ~one time slice — the observed spine collapses
        "short-lived": base.withColumn(
            "user_id", F.expr(f"(__ts_us - {int(b['lo'])}) DIV {slice_us}")
        ),
    }

    rows = []
    for scen, ev in scenarios.items():
        for mode in ("observed", "global"):
            def run():
                return timeseries.resample_gapfill(
                    ev, "user_id", "__ts_us", "value", spine=mode
                )

            spine_rows = run().count()
            sec = time_run(run)
            rows.append(
                (scen, mode, n, int(n_keys), spine_rows, round(sec, 2))
            )

    # the guard: the global rectangle must refuse a 10M-row bound
    guard = "did not fire"
    try:
        timeseries.resample_gapfill(
            ev, "user_id", "__ts_us", "value",
            spine="global", max_spine_rows=10_000_000,
        ).count()
    except ValueError as e:
        guard = f"fired: {e}"

    print("| key shape | spine mode | events | keys | spine rows | min-of-2 sec |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| {} | {} | {} | {} | {} | {} |".format(*r))
    print(f"guard (global, max_spine_rows=10M): {guard}")


if __name__ == "__main__":
    main()
