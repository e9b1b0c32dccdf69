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

_ALL = {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
    **_ROUND3,
    **_ROUND5,
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule, rotated each round so no
# query's green row goes stale. Round 5 leads with the eight queries the
# events nanos->micros testdata drift broke in r4 (now fixed), then
# everything whose last oracle row dates from round 2. Queries past slot
# 50 stay runnable + benched.
_PRIORITY = [
    # -- broken in r4 (events ts nanos->micros drift), fixed this round --
    "sessionize_events",
    "events_tumbling_window",
    "asof_join_events",
    "interval_join_events",
    "events_stream_tumbling",
    "events_stream_sliding",
    "events_stream_session",
    "events_stream_enrich",
    # -- r2-stale stateful stream + reworked-this-round vocab ranking --
    "events_stream_stateful",
    "vocab_coverage",
    # -- new round-5 queries (first oracle check this round) --
    "mixture_rebalance",
    "mixture_rebalance_tokens",
    "quantile_band_filter",
    "events_stream_join",
    "shard_stats",
    "dedup_incremental",
    "line_dedup",
    "decontaminate_remove",
    # -- greens last verified in round 2, rotated back into the window --
    # tpch_q4 rotates past the window this round (static SQL over
    # stable tables) to make room for events_stream_join
    "tpch_q5_local_supplier",
    # tpch_q6 rotates out (static SQL over stable tables); hash_sample +
    # split_assign rotate out (their md5-bucket membership machinery is
    # freshly re-verified via mixture_rebalance / shard_stats)
    # tpch_q7 rotates out (static SQL over stable tables) to make room
    "anti_join",
    "dedup_simhash",
    "dedup_simhash_near_dups",
    "near_dup_removal",
    "dedup_embedding_cosine",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "kmeans_update",
    "dedup_cluster_assign",
    "pii_scrub",
    "salted_join_events",
    "corpus_curation",
    "token_count",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "multimodal_binary",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_chunks",
    "quality_filter",
    "vocab_topk",
    "tf_idf",
    "bigram_counts",
    "pack_sequences",
    "stratified_sample",
    "delta_classify",
    "delta_load_dimension",
    # delta_load_fact + tpch_q10 rotate past the window this round
    # (pytest-covered / static SQL over stable tables) to make room
    "scd2_dimension",
    # star_schema_pipeline rotates past the window this round (benched
    # every round + covered end-to-end by pytest) to make room
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
