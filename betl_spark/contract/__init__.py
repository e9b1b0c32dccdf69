"""The engine's declared workload: queries + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 (or a
beyond-reference scale operator) through the engine's public surface,
paired with ANSI SQL an independent engine (DuckDB) can run on the same
parquet tables. The driver hash-compares both result sets, so every
query here is an executable correctness contract.

Determinism rules used throughout (so Spark and DuckDB agree bit-for-bit):
- money/measure aggregation is done in DECIMAL(18,2) (the data is
  2-decimal exact) and only cast to DOUBLE at the end;
- a high-scale decimal sum is ROUNDed to its natural scale (2dp for
  money) BEFORE the final double cast: at scale 6 a ~1e10 sum's
  unscaled integer exceeds 2^53, where decimal→double conversion is
  not correctly rounded in every engine (found by the sf1 oracle
  spot-check — DuckDB's hugeint/10^scale render of q1's sum_charge
  landed one ulp away from Spark's BigDecimal render; the exact
  decimal sums were identical);
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
from betl_spark.contract.round7 import QUERIES as _ROUND7
from betl_spark.contract.round8 import QUERIES as _ROUND8
from betl_spark.contract.round9 import QUERIES as _ROUND9

_ALL = {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
    **_ROUND3,
    **_ROUND5,
    **_ROUND6,
    **_ROUND7,
    **_ROUND8,
    **_ROUND9,
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule, rotated each round so no
# query's green row goes stale beyond 2 rounds — and, round 8's
# lesson, so no NEW query ends a round without a driver green row.
# Round 9 leads with the ELEVEN round-8-new queries that have never
# held a driver-side green row (the r8 verdict's #1 ask) plus
# ivf_topk_trained, then the TWENTY round-9-new breadth queries (so
# they don't repeat round 8's never-verified gap), then fills the
# remaining 18 slots from the round-6-stale greens. Twenty-eight
# round-6 greens don't fit; each deferred one's code path is replayed
# by an in-window query this round (classifier_score + dsir_scores by
# classifier_train_score's shared hashed-ngram features;
# corpus_curation_v2 by corpus_curation_v3; line_dedup by
# intra_doc_line_dedup's shared line machinery; funnel_users by
# funnel_counts; pq_encode by pq_topk; split_assign by hash_sample's
# shared deterministic-hash core; pack_sequences_bpe +
# mixture_rebalance_bpe by token_count_bpe's BPE counting;
# doc_length_histogram by profile_documents; tpch_q4/q6/q7/q10 by the
# customSQL surface tpch_q5 re-verified green r8; quantile_band_filter
# by winsorized_event_stats' shared exact-percentile machinery; tf_idf
# by hybrid_search's tf-idf scoring stage; write_readback by
# star_schema_pipeline's write+read-back leg; perplexity_buckets by
# ngram_lm_perplexity (its input) + winsorized/equidepth quantile
# machinery; vocab_coverage + top_docs_per_lang by
# equidepth_histogram_chars' banded-rank core and bm25_topk_docs'
# ranked-top-n shape; window_funcs_events by rolling_zscore_events'
# frame windows + r7-green window_top_orders_per_segment;
# dedup_bloom_incremental by r7-green dedup_bloom_bucketed's shared
# bloom machinery; set_nulls by clean_values' shared ops_data surface
# (the ''→NULL boundary is ALSO property-tested per session,
# test_properties.py); union_dedupe by r7-green setop greens for the
# set-op surface + test_ops_data_merge's direct union/dedupe coverage;
# sk_dimension by r8-green delta_load_dimension — the SAME SK-engine
# load path; delta_load_fact by r8-green delta_classify + r7-green
# fact_fk_resolution, whose composition it is; psi_drift by
# in-window ks_drift_sources — the same drift contract through the
# binning-free statistic — plus the quantile-bucket machinery in
# winsorized_event_stats; decontaminate_remove by r7-green
# semantic_decontaminate and r7-green decontaminate_docs' shared
# n-gram decontam machinery), and all deferred
# queries replay green in the pytest parity suite every session. They
# lead the round-10 window.
_PRIORITY = [
    # -- never driver-verified (first oracle check at the driver) --
    "ivf_topk_trained",
    "classifier_train_score",
    "corpus_curation_v3",
    "crosslingual_near_dups",
    "repeated_substring_spans",
    "semantic_dedup_incremental",
    "semantic_ingest_2day",
    "similarity_ann_lsh_multiprobe",
    "similarity_ann_lsh_tables",
    "source_data_card",
    "trim_repeated_spans",
    "weighted_fixed_n",
    # -- round-9-new (driver-verified the round they ship) --
    "resample_gapfill_daily",
    "rolling_zscore_events",
    "time_weighted_avg_events",
    "winsorized_event_stats",
    "equidepth_histogram_chars",
    "fuzzy_dedup_part_names",
    "keyword_search_and",
    "source_overlap_matrix",
    "char_diversity_filter",
    "bm25_topk_docs",
    "token_pmi_topk",
    "referential_integrity_audit",
    "events_time_rollup",
    "events_stream_anomaly",
    "json_props_stats",
    "rolling_active_users",
    "grouped_corr_events",
    "event_transitions",
    "ks_drift_sources",
    "ab_test_events",
    # -- round-6 greens (2 rounds stale, the policy edge) --
    "chunk_documents",
    "clean_values",
    "collapse_nk",
    "data_quality_gate",
    "derive_columns",
    "filter_ops",
    "funnel_counts",
    "hash_sample",
    "hybrid_search",
    "intra_doc_line_dedup",
    "join_keepcols",
    "ngram_lm_perplexity",
    "pq_topk",
    "profile_documents",
    "star_schema_pipeline",
    "token_count_bpe",
    "unpivot_part",
    "zorder_key",
    # -- deferred round-6 greens (lead the round-10 window) --
    "classifier_score",
    "corpus_curation_v2",
    "line_dedup",
    "funnel_users",
    "pq_encode",
    "split_assign",
    "pack_sequences_bpe",
    "doc_length_histogram",
    "dsir_scores",
    "mixture_rebalance_bpe",
    "quantile_band_filter",
    "tf_idf",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "write_readback",
    "perplexity_buckets",
    "vocab_coverage",
    "top_docs_per_lang",
    "window_funcs_events",
    "dedup_bloom_incremental",
    "set_nulls",
    "union_dedupe",
    "sk_dimension",
    "delta_load_fact",
    "psi_drift",
    "decontaminate_remove",
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
