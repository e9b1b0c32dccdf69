#!/usr/bin/env python
"""Full non-quadratic contract parity sweep at sf10 (round-11).

Replays the driver-grade Spark-vs-DuckDB comparison (same normalize
code as tests/test_oracle_parity.py) at /root/repo/.scale/sf10 — the
fourth value-verified scale point, two full decades above bench scale.
The DuckDB-quadratic control families (semantic_*, crosslingual,
classifier_train*, substring spans, bpe_train, curation_v2/v3) are
excluded exactly as in the sf3 sweep; their value parity is pinned at
sf1 (SCALE.md).

Usage:
  PYTHONPATH=/root/repo python scripts/sf10_parity_sweep.py [names...]
Results append to /tmp/sf10_sweep_results.txt (resumable: already-
logged queries are skipped).
"""

from __future__ import annotations

import os
import sys
import time

SF = "/root/repo/.scale/sf10"
RESULTS = "/tmp/sf10_sweep_results.txt"

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> None:
    import duckdb

    from betl_spark.contract import ORACLES, QUERIES
    from betl_spark.contract.common import TABLES
    from betl_spark.session import build_spark
    from test_oracle_parity import normalize

    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        quad_markers = (
            "semantic_", "crosslingual", "classifier_train",
            "repeated_substring", "repeated_spans", "bpe_train",
            "curation_v",
        )
        names = [
            n for n in sorted(ORACLES)
            if not any(m in n for m in quad_markers)
        ]
    done = set()
    if os.path.exists(RESULTS):
        done = {ln.split()[0] for ln in open(RESULTS) if ln.strip()}
    todo = [n for n in names if n not in done]
    print(f"{len(todo)} to run ({len(done)} already logged)", flush=True)

    spark = build_spark("sf10_parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    n_fail = 0
    for i, name in enumerate(todo):
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF)
            s = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
            t_spark = time.time() - t0
            t1 = time.time()
            res = con.execute(ORACLES[name])
            d = normalize(
                [x[0] for x in res.description], res.fetchall()
            )
            t_duck = time.time() - t1
            ok = s == d
            status = "MATCH" if ok else "MISMATCH"
            if not ok:
                n_fail += 1
        except Exception as ex:  # noqa: BLE001 - log and continue
            status = f"ERROR {type(ex).__name__}: {str(ex)[:120]}"
            t_spark = time.time() - t0
            t_duck = 0.0
            n_fail += 1
        line = f"{name} {status} spark={t_spark:.1f}s duck={t_duck:.1f}s"
        print(f"[{i + 1}/{len(todo)}] {line}", flush=True)
        with open(RESULTS, "a") as f:
            f.write(line + "\n")
    print(f"done; failures: {n_fail}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
