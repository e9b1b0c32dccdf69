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
# query's green row goes stale beyond 2 rounds. Round 9 leads with the
# ELEVEN round-8-new queries that have never held a driver-side green
# row (the r8 verdict's #1 ask), then fills the remaining 39 slots from
# the 46 queries whose last driver green dates from round 6 (2 rounds
# old — the policy edge). Eight round-6 greens don't fit; each deferred
# one's code path is replayed by an in-window composite this round
# (classifier_score by classifier_train_score; corpus_curation_v2 by
# corpus_curation_v3; line_dedup by intra_doc_line_dedup's shared line
# machinery; funnel_users by funnel_counts; pq_encode by pq_topk;
# split_assign by hash_sample's shared deterministic-hash core;
# pack_sequences_bpe by token_count_bpe's BPE counting + round-8-green
# pack_sequences' packing; doc_length_histogram by profile_documents'
# shared profiling machinery), and all eight replay green in the
# pytest parity suite every session. They lead the round-10 window.
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
    # -- round-6 greens (2 rounds stale, the policy edge) --
    "chunk_documents",
    "clean_values",
    "collapse_nk",
    "data_quality_gate",
    "decontaminate_remove",
    "dedup_bloom_incremental",
    "delta_load_fact",
    "derive_columns",
    "dsir_scores",
    "filter_ops",
    "funnel_counts",
    "hash_sample",
    "hybrid_search",
    "intra_doc_line_dedup",
    "join_keepcols",
    "mixture_rebalance_bpe",
    "ngram_lm_perplexity",
    "perplexity_buckets",
    "pq_topk",
    "profile_documents",
    "psi_drift",
    "quantile_band_filter",
    "set_nulls",
    "sk_dimension",
    "star_schema_pipeline",
    "tf_idf",
    "token_count_bpe",
    "top_docs_per_lang",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "union_dedupe",
    "unpivot_part",
    "vocab_coverage",
    "window_funcs_events",
    "write_readback",
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
