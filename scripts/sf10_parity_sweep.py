#!/usr/bin/env python
"""Full non-quadratic contract parity sweep at sf10 (round-11).

The fourth value-verified scale point, two full decades above bench
scale. The DuckDB-quadratic control families (semantic_*,
crosslingual, classifier_train*, substring spans, bpe_train,
curation_v2/v3) are excluded exactly as in the sf3 sweep; their value
parity is pinned at sf1 (SCALE.md).

Compare strategy — EXCEPT ALL inside DuckDB, not python rows: at sf10
several queries return LINEITEM-GRAIN outputs (60M rows); the pytest
normalize path (python repr per cell + sort) needs ~30 GB and tens of
minutes PER SIDE at that size. Instead the Spark result ships to
DuckDB as ONE Arrow table and the comparison is

    (s EXCEPT ALL d) UNION ALL (d EXCEPT ALL s)  -> must be empty,

with the oracle side CAST column-by-column to the Spark result's
DuckDB types. Exact multiset equality, vectorized, columnar. The one
semantic difference vs the bit-level hash compare: SQL equality folds
-0.0 = +0.0 (and would fold NaN = NaN, which the contract never
emits) — the stricter bit compare already ran green at sf0.01 / sf0.1
/ sf1 / sf3, so the signed-zero class is pinned below this scale.

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

QUAD_MARKERS = (
    "semantic_", "crosslingual", "classifier_train",
    "repeated_substring", "repeated_spans", "bpe_train", "curation_v",
    # round-13 growing-vocabulary corpus: blocked candidates grow
    # ~x^1.6 in vocab (SCALE.md) — 1.9B levenshteins at sf10 on the
    # DuckDB side; ladder-checked through sf3 instead
    "er_vocab_growth", "er_skew_method",
)


def main() -> None:
    import duckdb

    from betl_spark.contract import ORACLES, QUERIES
    from betl_spark.contract.common import TABLES
    from betl_spark.session import build_spark

    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        names = [
            n for n in sorted(ORACLES)
            if not any(m in n for m in QUAD_MARKERS)
        ]
    # Resume only skips queries whose logged status is MATCH or a
    # by-design GUARD refusal; MISMATCH/ERROR lines re-run, so a
    # resumed sweep cannot silently exit 0 past a failure (round-11
    # advisor item #2).
    done = set()
    if os.path.exists(RESULTS):
        done = {
            parts[0]
            for ln in open(RESULTS)
            if (parts := ln.split()) and len(parts) > 1
            and parts[1] in ("MATCH", "GUARD")
        }
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
            s_at = sdf.toArrow()
            t_spark = time.time() - t0
            t1 = time.time()
            con.register("s_res", s_at)
            types = {
                r[0]: r[1]
                for r in con.execute("DESCRIBE s_res").fetchall()
            }
            cols = sorted(s_at.column_names)
            sel_s = ", ".join(f'"{c}"' for c in cols)
            sel_d = ", ".join(
                f'CAST("{c}" AS {types[c]}) AS "{c}"' for c in cols
            )
            n_s, n_d, n_diff = con.execute(
                f"""
                WITH d AS ({ORACLES[name]})
                SELECT (SELECT count(*) FROM s_res),
                       (SELECT count(*) FROM d),
                       (SELECT count(*) FROM (
                          (SELECT {sel_s} FROM s_res
                           EXCEPT ALL SELECT {sel_d} FROM d)
                          UNION ALL
                          (SELECT {sel_d} FROM d
                           EXCEPT ALL SELECT {sel_s} FROM s_res)))
                """
            ).fetchone()
            con.unregister("s_res")
            t_duck = time.time() - t1
            ok = n_s == n_d and n_diff == 0
            status = (
                "MATCH"
                if ok
                else f"MISMATCH n_s={n_s} n_d={n_d} n_diff={n_diff}"
            )
            if not ok:
                n_fail += 1
        except Exception as ex:  # noqa: BLE001 - log and continue
            status = f"ERROR {type(ex).__name__}: {str(ex)[:160]}"
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
