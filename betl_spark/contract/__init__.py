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
from betl_spark.contract.round7 import QUERIES as _ROUND7

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
}

# The driver's per-round CORRECTNESS run covers the FIRST 50 entries, so
# dict order is the verification schedule, rotated each round so no
# query's green row goes stale beyond 2 rounds. Round 7 leads with the
# 38 queries whose last driver-side green dates from round 4 (2 rounds
# old — the policy edge; they would breach it if deferred again): the
# 21 operator/MDM/setop/static-SQL queries and the 17 static TPC-H
# queries. Next come queries whose implementation changed this round
# (their r6 greens no longer describe the shipped code), then new
# round-7 queries (first oracle check; names not yet in _ALL are
# skipped by the builder below), then round-5 greens whose code paths
# the round touches (multimodal codec gating). The list below is sized
# to exactly fill the 50-slot window once the new names land; the
# remaining round-5 greens (1 round stale after this round's window,
# refreshed by the pytest oracle-parity suite every session, which
# replays ALL queries) rotate to the front in round 8.
_PRIORITY = [
    # -- round-4 greens (2 rounds stale), operator queries first --
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
    # -- round-4 greens: the 17 static TPC-H queries --
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
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
    # -- code changed this round: prior greens no longer representative
    #    (near_dup_removal shares the exact CC path dedup_cluster_assign
    #    + semantic_dedup re-verify, and the three-path equality is
    #    property-tested, so it cedes its slot to a new query;
    #    dedup_bloom_incremental's default path is byte-identical this
    #    round — the new ref_hash_col param only adds a branch — so it
    #    cedes its slot too) --
    "semantic_dedup",
    "dedup_cluster_assign",
    "cohort_retention",
    # -- new round-7 queries (first oracle check) --
    "semantic_dedup_2level",
    "dedup_bloom_bucketed",
    "semantic_dedup_medoid",
    "boilerplate_removal",
    "mixture_repeats",
    "stratified_fixed_n",
    "semantic_decontaminate",
    "ivf_topk_indexed",
    "training_shuffle",
    # dedup_cluster_histogram and bpe_train_merges (the last two
    # round-7 queries) wait outside
    # the full window: the pytest oracle-parity suite replays them
    # green every session, the histogram's CC internals are re-verified
    # in-window via dedup_cluster_assign, and the trainer is pinned to
    # the pure-Python reference trainer by test; both take driver slots
    # in round 8
    # (the displaced multimodal round-5 greens kept their default code
    # path byte-identical — codec gating only adds the 'real' branch —
    # so they rotate forward in round 8 with the rest of round 5)
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
