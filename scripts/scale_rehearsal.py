#!/usr/bin/env python
"""Scale rehearsal: the most expensive contract queries at sf0.1 vs a
real sf1 decade (scripts/make_scale_data.py), min-of-2 timings each,
emitted as a markdown table for SCALE.md.

The claim under test: every plan's cost grows ~linearly in the data
(≤~10x for a 10x decade). Superlinear growth (quadratic candidate
generation, per-round iterative blowup, state-store explosions) shows
up immediately at one decade; plan inspection alone can't prove its
absence.
"""

from __future__ import annotations

import gc
import sys
import time

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"

REHEARSAL = [
    "star_schema_pipeline",
    "cube_revenue",
    "rollup_revenue",
    "dedup_cluster_assign",
    "near_dup_removal",
    "corpus_curation",
    "events_stream_session",
    "events_stream_stateful",
    "events_stream_enrich",
    "events_stream_dedupe",
    "dedup_simhash",
    "dedup_simhash_near_dups",
    "dedup_ngram_jaccard",
    "delta_load_dimension",
    "scd2_dimension",
    "tpch_q21_waiting_suppliers",
    "tpch_q18_large_volume_customer",
    "similarity_topk_bruteforce",
    "embedding_near_dups",
    "tpch_q1_pricing_summary",
    # round-5 additions
    "events_stream_join",
    "dedup_incremental",
    "line_dedup",
    "decontaminate_docs",
    "mixture_rebalance_tokens",
    "quantile_band_filter",
    "sessionize_events",
    "vocab_coverage",
    # round-6 additions
    "semantic_dedup",
    "ngram_lm_perplexity",
    "perplexity_buckets",
    "dsir_scores",
    "dedup_bloom_incremental",
    "token_count_bpe",
    "chunk_documents",
    "funnel_users",
    "cohort_retention",
    "profile_documents",
    "zorder_key",
    "top_docs_per_lang",
    "psi_drift",
    "window_funcs_events",
    "intra_doc_line_dedup",
    "classifier_score",
    "hybrid_search",
    "pq_encode",
    "pq_topk",
]


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
    from betl_spark.session import build_spark

    spark = build_spark("betl_spark_scale_rehearsal")
    names = [n for n in REHEARSAL if n in QUERIES]
    missing = [n for n in REHEARSAL if n not in QUERIES]
    if missing:
        print(f"# not in registry, skipped: {missing}", file=sys.stderr)

    # warm plans at the smallest SF (same policy as bench.py)
    for n in names:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        gc.collect()

    rows = []
    for n in names:
        t_small = time_query(QUERIES[n], spark, SF01)
        t_big = time_query(QUERIES[n], spark, SF1)
        ratio = t_big / t_small if t_small > 0 else float("nan")
        rows.append((n, t_small, t_big, ratio))
        print(f"{n}: sf0.1 {t_small:.2f}s  sf1 {t_big:.2f}s  x{ratio:.1f}", flush=True)

    # semantic_dedup, k scaled with the corpus (the SemDeDup contract:
    # cost is sum(n_cell^2), so cells must stay constant-size — the
    # fixed-k contract query is the superlinear control, this is the
    # prescribed operating mode). sf1 = 10 key-shifted replicas
    # (make_scale_data.py), so 10x the centroids = one centroid set per
    # replica shift, holding n_cell at the sf0.1 value.
    from betl_spark.contract.common import table as _table
    from betl_spark.contract.round6 import SEMANTIC_THRESHOLD
    from betl_spark.contract.scale import IVF_CENTROID_IDS
    from betl_spark.operators import similarity

    def sem_scaled(k_ids):
        def q(spark, sf_dir):
            emb = _table(spark, sf_dir, "embeddings")
            return similarity.semantic_dedup(
                emb, "vec_id", "embedding", k_ids, threshold=SEMANTIC_THRESHOLD
            )
        return q

    ids_sf1 = [c + i * 10**9 for i in range(10) for c in IVF_CENTROID_IDS]
    t_small = time_query(sem_scaled(IVF_CENTROID_IDS), spark, SF01)
    t_big = time_query(sem_scaled(ids_sf1), spark, SF1)
    ratio = t_big / t_small if t_small > 0 else float("nan")
    rows.append(("semantic_dedup_scaled_k", t_small, t_big, ratio))
    print(
        f"semantic_dedup_scaled_k: sf0.1 {t_small:.2f}s (k=8)  "
        f"sf1 {t_big:.2f}s (k=80)  x{ratio:.1f}",
        flush=True,
    )

    print()
    print("| query | sf0.1 (s) | sf1 (s) | growth (10x data) |")
    print("|---|---|---|---|")
    for n, a, b, r in sorted(rows, key=lambda x: -x[3]):
        print(f"| `{n}` | {a:.2f} | {b:.2f} | x{r:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
