"""State-store provider comparison for the stateful streaming family
(round-11 verdict ask #7).

``events_stream_stateful`` is the steepest sf10 decade row (x8.6,
state-commit-bound): every micro-batch commits each of the
STATE_PARTS partitions' state stores, and the default HDFS-backed
provider rewrites the FULL keyed state per commit (delta file +
periodic snapshot of an in-memory map). At 100 TB the store of record
would be RocksDB (incremental SST commits, state spills to disk
instead of executor heap). This harness runs the SAME contract query
at a chosen scale under both providers on one session and reports
wall-time + the query's final state metrics, so the SCALE.md
recommendation is measured, not argued.

Usage:
  PYTHONPATH=/root/repo python scripts/rocksdb_stateful_rehearsal.py \
      [sf_dir ...]            # default: .scale/sf1 then .scale/sf10

Notes:
- provider is frozen into a query at start, so setting the session
  conf between runs is enough (each run is its own streaming query
  with its own checkpoint);
- first a tiny sf0.001 warm run per provider (JIT + RocksDB JNI
  load), excluded from timing;
- value parity: both runs' outputs are hash-compared so the provider
  swap is proven behavior-neutral.
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def state_summary(progress) -> dict:
    if not progress:
        return {}
    ops = progress.get("stateOperators") or []
    if not ops:
        return {}
    op = ops[0]
    out = {
        "numRowsTotal": op.get("numRowsTotal"),
        "stateMemoryBytes": op.get("memoryUsedBytes"),
        "commitTimeMs": op.get("commitTimeMs"),
    }
    cm = op.get("customMetrics") or {}
    for k in (
        "rocksdbTotalBytesOfLiveSstFiles",
        "rocksdbSstFileSize",
        "loadedMapCacheHitCount",
        "stateOnCurrentVersionSizeBytes",
    ):
        if k in cm:
            out[k] = cm[k]
    return out


def run_once(spark, sf_dir: str, provider: str) -> tuple[float, dict, int]:
    from betl_spark.contract.streaming_delta import q_events_stream_stateful
    from betl_spark.streaming import events as ev

    spark.conf.set(PROVIDER_CONF, provider)
    gc.collect()
    t0 = time.perf_counter()
    df = q_events_stream_stateful(spark, sf_dir)
    h = df.selectExpr(
        "count(*) AS n",
        "sum(CAST(xxhash64(user_id, events_seen, running_value) "
        "AS DECIMAL(38,0))) AS h",
    ).collect()[0]
    wall = time.perf_counter() - t0
    import json

    prog = ev.LAST_PROGRESS
    if prog is None:
        prog = {}
    elif not isinstance(prog, dict):
        # pyspark 4 returns a StreamingQueryProgress object
        prog = json.loads(prog.json)
    return wall, state_summary(prog), (h["n"], str(h["h"]))


def main() -> None:
    from betl_spark.session import build_spark

    sf_dirs = sys.argv[1:] or [
        "/root/repo/.scale/sf1",
        "/root/repo/.scale/sf10",
    ]
    spark = build_spark("rocksdb_stateful_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # warm both providers on the tiny sf (JIT, JNI, codegen)
    for prov in (HDFS, ROCKSDB):
        run_once(spark, "/root/testdata/sf0.001", prov)

    print("| sf_dir | provider | wall (s) | state rows | state metrics |")
    print("|---|---|---|---|---|")
    for sf_dir in sf_dirs:
        results = {}
        for prov, tag in ((HDFS, "hdfs"), (ROCKSDB, "rocksdb")):
            wall, st, sig = run_once(spark, sf_dir, prov)
            results[tag] = (wall, st, sig)
            print(
                f"| {sf_dir} | {tag} | {wall:.2f} | "
                f"{st.get('numRowsTotal')} | {st} |",
                flush=True,
            )
        h1, h2 = results["hdfs"][2], results["rocksdb"][2]
        parity = "MATCH" if h1 == h2 else f"MISMATCH {h1} vs {h2}"
        speed = results["hdfs"][0] / max(results["rocksdb"][0], 1e-9)
        print(
            f"{sf_dir}: value parity {parity}; "
            f"rocksdb speedup vs hdfs x{speed:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
