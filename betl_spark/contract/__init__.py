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

_ALL = {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule. Round 1 checked the natural
# tpch→operators→scale prefix (49 green, dedup_simhash red on an
# oracle-side dtype bug, fixed); round 2 leads with the 26 queries that
# round never reached (streaming / delta / pipeline-e2e / similarity /
# text / multimodal / sampling), then the re-checks (fixed oracle,
# de-vacuized anti_join, new write-surface query), then a rotation of
# round-1 greens. Queries past slot 50 stay runnable + benched.
_PRIORITY = [
    # -- never oracle-checked in round 1 --
    "star_schema_pipeline",
    "delta_classify",
    "delta_load_dimension",
    "events_stream_tumbling",
    "events_stream_enrich",
    "events_stream_sliding",
    "events_stream_session",
    "events_stream_stateful",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "dedup_embedding_cosine",
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
    "split_assign",
    "hash_sample",
    # -- red/changed in round 1, re-check with fixed oracle/query --
    "dedup_simhash",
    "anti_join",
    "write_readback",
    # -- new in round 2, first check --
    "vocab_topk",
    "tf_idf",
    "bigram_counts",
    "pack_sequences",
    "stratified_sample",
    "quality_filter",
    "delta_load_fact",
    "dedup_simhash_near_dups",
    "near_dup_removal",
    "multimodal_audio_chunks",
    "kmeans_update",
    "scd2_dimension",
    "asof_join_events",
    "interval_join_events",
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
