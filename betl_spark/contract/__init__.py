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

_ALL = {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
    **_ROUND3,
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule. Round 1 checked the natural
# tpch→operators→scale prefix; round 2 checked the 50 entries that round
# 1 never reached (all green, CORRECTNESS_r02.json). Round 3 leads with
# the only two queries that have never had an oracle row (added after the
# round-2 gate ran), then new round-3 queries, then rotates the 41
# round-1-only greens back through so every query's green row is at most
# one round old. Queries past slot 50 stay runnable + benched.
_PRIORITY = [
    # -- never oracle-checked (landed after the round-2 gate) --
    "events_stream_dedupe",
    "repetition_features",
    # -- new round-3 queries (first oracle check this round) --
    "sessionize_events",
    "decontaminate_docs",
    "doc_length_quantiles",
    "vocab_coverage",
    "dedup_containment",
    # -- round-1-only greens, rotated back into the checked window --
    "filter_ops",
    "join_keepcols",
    "sk_dimension",
    "date_dimension",
    "audit_dimension",
    "clean_values",
    "derive_columns",
    "unpivot_part",
    "collapse_nk",
    "set_nulls",
    "apply_function_columns",
    "union_dedupe",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "mdm_map_master_data",
    "mdm_group_count",
    "fact_fk_resolution",
    "events_tumbling_window",
    "cube_revenue",
    "rollup_revenue",
    "top_customers",
    "window_top_orders_per_segment",
    "setop_intersect_nations",
    "setop_except_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_brand_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
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
