#!/usr/bin/env python
"""sf1 oracle spot-check (round-9 verdict item 3).

Driver-side correctness only ever runs at sf0.01, so scale-dependent
bugs — integer overflow in exact-sum aggregates, skew-path divergence,
partition-count-sensitive nondeterminism — would be invisible to the
gate. This job replays the full Spark-vs-DuckDB parity comparison
(tests/test_oracle_parity.py, same normalize/compare code) at sf1
(/root/repo/.scale/sf1, built by scripts/make_scale_data.py) for a
representative set: the semantic/dedup family (the heaviest custom
operators), the substring-span pair, two TPC-H anchors (exact DECIMAL
aggregation at 6M lineitem rows), and weighted_fixed_n (weighted
A-ES sampling — RNG/threshold logic that must not drift with scale).

Any mismatch is a release-blocking bug, not noise: the oracle is
deterministic and the queries are engineered order-independent.

Usage: PYTHONPATH=/root/repo python scripts/sf1_oracle_spotcheck.py
(HOURS, not minutes: the semantic-dedup family's DUCKDB side replays
the fixed-k quadratic pair stage single-threaded at sf1. To check only
newly-added queries, run the parity suite directly with
SPARK_GRAFT_SF_DIR_TEST=/root/repo/.scale/sf1 and -k <names> — the
previously-recorded families' sf1 greens are logged in SCALE.md.)

Results are recorded in SCALE.md ("sf1 oracle spot-check").
"""

from __future__ import annotations

import os
import subprocess
import sys

SPOTCHECK = [
    "semantic_dedup",
    "semantic_dedup_2level",
    "semantic_dedup_medoid",
    "semantic_dedup_incremental",
    "dedup_cluster_histogram",
    "dedup_minhash_lsh_pairs",
    "dedup_incremental",
    "repeated_substring_spans",
    "trim_repeated_spans",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "weighted_fixed_n",
    # round-9 family: exact-decimal window sums (rolling_zscore),
    # forward-fill windows (resample), streaming-state integer
    # arithmetic (events_stream_anomaly), log-based scoring at 10x
    # counts (bm25), and the pair-expansion overlap matrix
    "resample_gapfill_daily",
    "rolling_zscore_events",
    "events_stream_anomaly",
    "bm25_topk_docs",
    "source_overlap_matrix",
    # round-11 family: regex URL parsing, eTLD+1 reduction, canonical
    # keying, BIGINT-micros composite scoring (all 10 were sf1-checked
    # the round they shipped; these two are the representative pair)
    "url_canonical_dedup",
    "web_curation_pipeline",
]


def main() -> int:
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    if not os.path.isdir(sf1):
        print("sf1 data missing — run scripts/make_scale_data.py first", file=sys.stderr)
        return 2
    env = dict(os.environ, SPARK_GRAFT_SF_DIR_TEST=sf1)
    expr = " or ".join(SPOTCHECK)
    return subprocess.call(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_oracle_parity.py",
            "-q",
            "--no-header",
            "-p",
            "no:cacheprovider",
            "-k",
            expr,
        ],
        env=env,
    )


if __name__ == "__main__":
    raise SystemExit(main())
