"""Steady-state state-store commit overhead (round-12 verdict ask #8).

The round-12 provider comparison ran availableNow over ONE
micro-batch, so its ~30% RocksDB overhead figure measured a single
one-shot snapshot commit. This harness forces a ~10-micro-batch
replay of the SAME stateful query (events resharded to N files +
``maxFilesPerTrigger = N/10``) under both providers and reports the
PER-BATCH commit trail from the query's recentProgress — the
steady-state number a perpetual production stream actually pays.

Usage:
  PYTHONPATH=/root/repo python scripts/rocksdb_microbatch_rehearsal.py \
      [sf_dir]            # default: .scale/sf10
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
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
N_SHARDS = 20
FILES_PER_TRIGGER = 2  # -> ~10 micro-batches


def reshard_events(spark, sf_dir: str) -> str:
    """Split the single events parquet into N_SHARDS files so the file
    source can form micro-batches (its batching granularity is whole
    files)."""
    out = tempfile.mkdtemp(prefix="events_shards_")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(N_SHARDS)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def batch_trail(progresses) -> list[dict]:
    rows = []
    for p in progresses or []:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        op = ops[0]
        rows.append(
            {
                "batchId": p.get("batchId"),
                "inputRows": p.get("numInputRows"),
                "commitMs": op.get("commitTimeMs"),
                "stateRows": op.get("numRowsTotal"),
                "durationMs": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
        )
    return rows


def run_once(spark, shard_dir: str, provider: str):
    from betl_spark.contract.streaming_delta import STATE_PARTS
    from betl_spark.streaming import events as ev
    from betl_spark.streaming.events import (
        event_stream,
        run_stream_to_table,
        stateful_running_totals,
    )

    spark.conf.set(PROVIDER_CONF, provider)
    gc.collect()
    t0 = time.perf_counter()
    stream = event_stream(
        spark, shard_dir, max_files_per_trigger=FILES_PER_TRIGGER
    )
    out = run_stream_to_table(
        stateful_running_totals(stream),
        output_mode="update",
        state_partitions=STATE_PARTS,
    )
    # update-mode emits one row per user per batch it changed in; the
    # LAST row per user is the final running total — dedupe for parity
    h = out.selectExpr(
        "count(DISTINCT user_id) AS n",
        "sum(CAST(xxhash64(user_id, events_seen) AS DECIMAL(38,0))) AS h",
    ).collect()[0]
    wall = time.perf_counter() - t0
    # parity covers BOTH the distinct-user count and the content hash
    # over (user_id, events_seen) — equal user counts with different
    # running totals must report MISMATCH (round-13 advisor)
    return wall, batch_trail(ev.LAST_RECENT_PROGRESS), (h["n"], h["h"])


def main() -> None:
    from betl_spark.session import build_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    spark = build_spark("rocksdb_microbatch_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    shards = reshard_events(spark, sf_dir)
    try:
        # warm both providers (JIT, JNI)
        for prov in (HDFS, ROCKSDB):
            spark.conf.set(PROVIDER_CONF, prov)
            from betl_spark.contract.streaming_delta import (
                q_events_stream_stateful,
            )

            q_events_stream_stateful(spark, "/root/testdata/sf0.001").count()

        print(f"shards={N_SHARDS} filesPerTrigger={FILES_PER_TRIGGER}")
        results = {}
        for prov, tag in ((HDFS, "hdfs"), (ROCKSDB, "rocksdb")):
            wall, trail, sig = run_once(spark, shards, prov)
            results[tag] = (wall, trail, sig)
            commits = [b["commitMs"] for b in trail if b["commitMs"]]
            steady = commits[2:] or commits  # skip ramp-up batches
            print(
                f"{tag}: wall {wall:.2f}s over {len(trail)} batches; "
                f"commitMs per batch {commits}; steady-state mean "
                f"{sum(steady)/max(len(steady),1):.0f}ms"
            )
            for b in trail:
                print(f"  {b}")
        w_h, w_r = results["hdfs"][0], results["rocksdb"][0]
        parity = (
            "MATCH"
            if results["hdfs"][2] == results["rocksdb"][2]
            else f"MISMATCH {results['hdfs'][2]} vs {results['rocksdb'][2]}"
        )
        print(f"user-set parity {parity}; rocksdb/hdfs wall x{w_r/w_h:.2f}")
    finally:
        shutil.rmtree(shards, ignore_errors=True)


if __name__ == "__main__":
    main()
