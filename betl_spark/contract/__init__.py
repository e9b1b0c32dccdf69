"""The engine's declared workload: queries + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 (or a
beyond-reference scale operator) through the engine's public surface,
paired with ANSI SQL an independent engine (DuckDB) can run on the same
parquet tables. The driver hash-compares both result sets, so every
query here is an executable correctness contract.

Determinism rules used throughout (so Spark and DuckDB agree bit-for-bit):
- money/measure aggregation is done in DECIMAL(18,2) (the data is
  2-decimal exact) and only cast to DOUBLE at the end;
- averages are exact-decimal sums divided as doubles at the end;
- LIMIT queries carry a total ORDER BY (tiebreak on a key);
- timestamps are bucketed with floor(epoch/N) (truncation-safe in both
  engines) or cast to DATE.
"""

from betl_spark.contract.tpch import QUERIES as _TPCH
from betl_spark.contract.operators import QUERIES as _OPERATORS
from betl_spark.contract.scale import QUERIES as _SCALE
from betl_spark.contract.streaming_delta import QUERIES as _STREAMING
from betl_spark.contract.pipeline_e2e import QUERIES as _PIPELINE
from betl_spark.contract.round3 import QUERIES as _ROUND3
from betl_spark.contract.round5 import QUERIES as _ROUND5
from betl_spark.contract.round6 import QUERIES as _ROUND6

_ALL = {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
    **_ROUND3,
    **_ROUND5,
    **_ROUND6,
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule, rotated each round so no
# query's green row goes stale beyond 2 rounds. Round 6 leads with the
# nine queries whose last oracle row dates from round 2, then the new
# round-6 queries (first oracle check this round), then every query
# whose implementation changed this round (their r5 greens no longer
# describe the shipped code), then the non-TPC-H operator queries last
# verified in round 4. The priority list is now 60 names for 50 slots:
# the final ten r4-greens (events_stream_dedupe, decontaminate_docs,
# doc_length_quantiles, dedup_containment,
# window_top_orders_per_segment, the set-op/cube/rollup/top-k static
# SQL — all unchanged since r4 and re-checked every session by the
# pytest oracle-parity suite, which runs ALL queries) wait for round 7,
# where they rotate to the front. Also outside the
# window: 17 static TPC-H SQL queries (same static/pytest argument)
# and the round-5 greens (1 round old).
_PRIORITY = [
    # -- greens last verified in round 2, rotated back in --
    "star_schema_pipeline",
    "delta_load_fact",
    "write_readback",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "hash_sample",
    "split_assign",
    # -- new round-6 queries (first oracle check this round; names not
    #    yet in _ALL are skipped by the builder below) --
    "semantic_dedup",
    "token_count_bpe",
    "mixture_rebalance_bpe",
    "doc_length_histogram",
    "ngram_lm_perplexity",
    "dedup_bloom_incremental",
    "dsir_scores",
    "perplexity_buckets",
    "chunk_documents",
    "funnel_users",
    "funnel_counts",
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
    "corpus_curation_v2",
    "data_quality_gate",
    "pack_sequences_bpe",
    # -- code changed this round: prior greens no longer representative --
    "tf_idf",
    "decontaminate_remove",
    "line_dedup",
    "quantile_band_filter",
    "vocab_coverage",
    "dedup_cluster_assign",
    "near_dup_removal",
    # -- round-4 greens (2 rounds), operator queries first --
    "filter_ops",
    "union_dedupe",
    "join_keepcols",
    "derive_columns",
    "clean_values",
    "set_nulls",
    "unpivot_part",
    "collapse_nk",
    "sk_dimension",
    "fact_fk_resolution",
    "date_dimension",
    "audit_dimension",
    "mdm_group_count",
    "mdm_map_master_data",
    "apply_function_columns",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "repetition_features",
    "events_stream_dedupe",
    "decontaminate_docs",
    "doc_length_quantiles",
    "dedup_containment",
    "window_top_orders_per_segment",
    "setop_except_customers",
    "setop_intersect_nations",
    "cube_revenue",
    "rollup_revenue",
    "top_customers",
]

QUERIES: dict = {}
ORACLES: dict = {}
for _name in [*(_n for _n in _PRIORITY if _n in _ALL), *_ALL]:
    if _name in QUERIES:
        continue
    _fn, _sql = _ALL[_name]
    QUERIES[_name] = _fn
    if _sql is not None:
        ORACLES[_name] = _sql
