#!/usr/bin/env python
"""Second decade of scale evidence (round-10 verdict ask #6): the
top-3 heavy queries at sf1 → sf3 (3x the data, .scale/sf3 built by
`make_scale_data.py --sf 3` — 30 key-shifted replicas of sf0.1 with
50 distinct letter substitutions so duplicate density stays constant).

All prior growth claims rest on the single sf0.1→sf1 decade; this adds
a second measured point per query so "linear in the data" is a line,
not a segment:

- `semantic_dedup_2level` in its PRESCRIBED scaled-k operating mode
  (k ∝ n: one centroid set per replica shift — the contract query's
  fixed-k form is the documented quadratic control and is NOT a
  100 TB operating point; at sf3 fixed-k would be ~9x sf1's 217 s for
  no information).
- `corpus_curation_v3` (contract query as-is — the capstone pipeline).
- `ngram_novelty_docs` (contract as-is; join-free rewrite this round).

Run: PYTHONPATH=/root/repo python scripts/second_decade.py
"""

from __future__ import annotations

import gc
import time

SF1 = "/root/repo/.scale/sf1"
SF3 = "/root/repo/.scale/sf3"


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        gc.collect()
    return best


def main() -> None:
    from betl_spark.contract import QUERIES
    from betl_spark.contract.common import table
    from betl_spark.contract.round6 import SEMANTIC_THRESHOLD
    from betl_spark.contract.round7 import COARSE_CENTROID_IDS
    from betl_spark.contract.scale import IVF_CENTROID_IDS
    from betl_spark.operators import similarity
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_second_decade")

    def two_level_scaled(n_rep):
        fine = [c + i * 10**9 for i in range(n_rep) for c in IVF_CENTROID_IDS]
        coarse = [
            c + i * 10**9 for i in range(n_rep) for c in COARSE_CENTROID_IDS
        ]

        def q(spark, sf_dir):
            emb = table(spark, sf_dir, "embeddings")
            return similarity.semantic_dedup_2level(
                emb, "vec_id", "embedding", fine, coarse,
                threshold=SEMANTIC_THRESHOLD,
            )

        return q

    rows = []
    for name, fn1, fn3 in [
        (
            "semantic_dedup_2level (scaled k: 80→240)",
            two_level_scaled(10),
            two_level_scaled(30),
        ),
        (
            "corpus_curation_v3",
            QUERIES["corpus_curation_v3"],
            QUERIES["corpus_curation_v3"],
        ),
        (
            "ngram_novelty_docs",
            QUERIES["ngram_novelty_docs"],
            QUERIES["ngram_novelty_docs"],
        ),
    ]:
        t1 = time_query(fn1, spark, SF1)
        t3 = time_query(fn3, spark, SF3)
        ratio = t3 / t1 if t1 > 0 else float("nan")
        rows.append((name, t1, t3, ratio))
        print(f"{name}: sf1 {t1:.2f}s  sf3 {t3:.2f}s  x{ratio:.2f}", flush=True)

    print()
    print("| query | sf1 (s) | sf3 (s) | growth (3x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in rows:
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
