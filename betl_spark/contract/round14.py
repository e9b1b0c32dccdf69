"""Round-14 contract queries: the mergeable HISTOGRAM quantile sketch
family (operators/sketches.py family 2) — the round-13 verdict's ask
#7. ``percentile_approx`` answers per-query but is not mergeable; the
equi-width bin-count vector completes the HLL symmetry: scan the fact
table once per ingest window, persist a ~0.5 KB vector per group, and
answer every coarser rollup by VECTOR SUM — which, unlike HLL union,
is exact, so the rolled-up histogram is bit-identical to a direct one.

Oracle strategy (stronger than the round-13 quantile contract where
only n was value-matched): histogram bin counts and the chosen
quantile bin are DETERMINISTIC INTEGER facts DuckDB can recompute
independently — the bin index is plain IEEE double arithmetic in a
pinned operation order (operators/sketches.py:histogram_bin_sql, one
SQL text for both dialects), the counts are exact, and the selection
predicate ``100*cum >= p*n`` is integer. So both queries here value-
match the full output, with only the Spark-side raw-data rank audit
pinned TRUE (same adjudicated pattern as sketch_distinct_accuracy).

Domain constants: events.value is a long-tailed double in
[0.01, ~560]; [lo, hi) = [0.0, 256.0) with 64 bins gives width 4.0 —
an exact power-of-two binary width, so the bin expression's multiply
and divide are exact scalings (floor(v * 64 / 256) == floor(v/4) with
zero rounding hazard) — and routes the real >256 tail through the
overflow bin, keeping the clamp/overflow paths exercised by data, not
just by tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table, ts_micros
from betl_spark.operators import sketches

QUERIES: dict = {}

#: histogram domain for events.value (see module docstring)
_LO, _HI, _B = 0.0, 256.0, 64

#: shared bin-index SQL (both dialects) over the events.value column
_BIN_SQL = sketches.histogram_bin_sql("value", _LO, _HI, _B)


def _daily_rolled(spark, sf_dir):
    """The family's production shape: per-(event_type, day) sketch
    table (the ONE fact scan), rolled up to event_type by vector sum.
    Going through the daily grain keeps mergeability in the audited
    path — a wrong merge breaks the value match downstream."""
    ev0 = table(spark, sf_dir, "events")
    ev = ev0.select(
        "event_type",
        "value",
        (ts_micros(ev0) / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    daily = sketches.histogram_sketch(
        ev, ["event_type", "day"], "value", _LO, _HI, _B
    )
    return ev, sketches.merge_histograms(daily, ["event_type"], _B)


# ---- 1. hist_sketch_bins: the rolled-up histogram itself, every bin
# value-matched against DuckDB's independent exact census ----


def q_hist_sketch_bins(spark, sf_dir):
    """Dense rolled-up histogram: one row per (event_type, bin)
    including empty bins — the dense-vector contract is itself under
    test. The Spark side goes fact scan -> daily sketches -> vector-sum
    rollup; the oracle computes the same census directly, so any
    defect in binning, densify, or merge breaks the value match."""
    _, rolled = _daily_rolled(spark, sf_dir)
    return rolled.select(
        "event_type", F.posexplode("hist_bins").alias("bin", "bin_n")
    ).select("event_type", F.col("bin").cast("long").alias("bin"), "bin_n")


HIST_SKETCH_BINS_SQL = f"""
WITH census AS (
  SELECT event_type, {_BIN_SQL} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
bins AS (SELECT UNNEST(range(0, {_B + 2})) AS bin),
types AS (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL)
SELECT t.event_type,
       CAST(b.bin AS BIGINT) AS bin,
       CAST(coalesce(c.n, 0) AS BIGINT) AS bin_n
FROM types t CROSS JOIN bins b
LEFT JOIN census c ON c.event_type = t.event_type AND c.bin = b.bin
"""
QUERIES["hist_sketch_bins"] = (q_hist_sketch_bins, HIST_SKETCH_BINS_SQL)


# ---- 2. hist_quantile_mergeable: quantiles answered FROM the rolled
# sketch — chosen bin and edges value-matched (DuckDB re-derives them
# from its own exact census), rank guarantee audited against raw data ----


def q_hist_quantile_mergeable(spark, sf_dir):
    """Per event type and p in {50, 90, 99}: the quantile bin chosen
    from the daily->rolled sketch chain, its value edges, and the
    Spark-side rank audit — exact integer arithmetic against the RAW
    fact rows: count(value < bin_lo) must fall short of the target
    rank and count(value <= bin_hi) must reach it (the histogram
    guarantee: the true p-quantile lies inside the chosen bin; NULL
    edges — the unbounded side of under/overflow bins — make their
    side of the audit vacuous). The oracle re-derives bin and edges
    independently, so the selection logic is value-matched, not just
    TRUE-pinned; rank_ok is the adjudicated TRUE-pin pattern."""
    ev, rolled = _daily_rolled(spark, sf_dir)
    q = sketches.histogram_quantiles(
        rolled, ["event_type"], [50, 90, 99], _LO, _HI, _B
    )
    audit = (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "p_pct", "n_values", "bin")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("bin_lo"), 1).otherwise(0)
            ).cast("long").alias("__n_lt_lo"),
            F.sum(
                F.when(
                    F.col("bin_hi").isNull()
                    | (F.col("value") <= F.col("bin_hi")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("__n_le_hi"),
        )
    )
    n, p = F.col("n_values"), F.col("p_pct")
    rank_ok = (F.col("__n_lt_lo") * 100 < p * n) & (
        F.col("__n_le_hi") * 100 >= p * n
    )
    # re-attach the edges (audit grouped on the integer keys only)
    return audit.join(
        q.select("event_type", "p_pct", "bin", "bin_lo", "bin_hi"),
        ["event_type", "p_pct", "bin"],
    ).select(
        "event_type",
        "p_pct",
        "n_values",
        "bin",
        "bin_lo",
        "bin_hi",
        rank_ok.alias("rank_ok"),
    )


HIST_QUANTILE_MERGEABLE_SQL = f"""
WITH census AS (
  SELECT event_type, {_BIN_SQL} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS n_values
  FROM census
),
ps AS (SELECT UNNEST([50, 90, 99]) AS p_pct),
best AS (
  SELECT event_type, p_pct, n_values, min(bin) AS bin
  FROM cum CROSS JOIN ps
  WHERE 100 * cum >= p_pct * n_values
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(p_pct AS BIGINT) AS p_pct,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(bin AS BIGINT) AS bin,
       CASE WHEN bin = 0 THEN NULL
            WHEN bin = {_B + 1} THEN {_HI!r}
            ELSE {_LO!r} + (bin - 1) * {(_HI - _LO) / _B!r} END AS bin_lo,
       CASE WHEN bin = {_B + 1} THEN NULL
            WHEN bin = 0 THEN {_LO!r}
            ELSE {_LO!r} + bin * {(_HI - _LO) / _B!r} END AS bin_hi,
       TRUE AS rank_ok
FROM best
"""
QUERIES["hist_quantile_mergeable"] = (
    q_hist_quantile_mergeable,
    HIST_QUANTILE_MERGEABLE_SQL,
)


# ---- 3. topk_sketch_heavyhitters: mergeable offline-Misra-Gries
# heavy-hitter summaries over document tokens, per-source top-10 from
# shard-merged bounds — the ENTIRE construction (shard censuses,
# thresholds, residuals, merged exact-integer bounds, final ranking)
# is replayed independently by the DuckDB oracle, so every output
# column is value-matched; nothing is TRUE-pinned ----

#: Misra-Gries budget per (source, shard) summary; the synthetic word
#: pool has ~60-100 distinct tokens per slice, so m=16 exercises REAL
#: truncation (t > 0) at every scale (m=64 would degenerate to an
#: exact census on this corpus)
_TOPK_M = 16

#: shards per source (the "daily partition" axis of the rehearsal)
_SHARDS = 8

#: final top-k per source from the merged bounds
_TOPK_OUT = 10


def q_topk_sketch_heavyhitters(spark, sf_dir):
    """Per source: the top-10 tokens by merged-summary LOWER bound
    (ties broken by token), with the exact-integer bound interval and
    the independently-computed exact count. The Spark side goes
    fact scan -> per-(source, shard) Misra-Gries summaries ->
    bound-merge to source grain -> rank; the oracle rebuilds the same
    summaries from scratch in SQL. ``exact_n`` always lands inside
    [est_lo, est_hi] by construction — and because BOTH engines
    compute all three columns independently, a defect in thresholds,
    residuals, or the absent-partition accounting breaks the value
    match rather than a self-referential boolean."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select(
        "source", (F.col("doc_id") % _SHARDS).alias("shard"), "text"
    )
    toks = docs.select(
        "source", "shard", F.explode(F.split("text", " ")).alias("token")
    )
    sk = sketches.topk_sketch(toks, ["source", "shard"], "token", _TOPK_M)
    merged = sketches.merge_topk_sketches(sk, ["source"]).withColumnRenamed(
        "item", "token"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("est_lo").desc(), F.col("token")
    )
    top = merged.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= _TOPK_OUT
    )
    exact = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    return top.join(exact, ["source", "token"]).select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "token",
        "est_lo",
        "est_hi",
        "exact_n",
    )


TOPK_SKETCH_HEAVYHITTERS_SQL = f"""
WITH toks AS (
  SELECT source, doc_id % {_SHARDS} AS shard,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
census AS (
  SELECT source, shard, token, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE token IS NOT NULL GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source, shard ORDER BY c DESC, token) AS rn
  FROM census
),
thresh AS (
  SELECT source, shard,
         CAST(coalesce(max(CASE WHEN rn = {_TOPK_M + 1} THEN c END), 0)
              AS BIGINT) AS t
  FROM ranked GROUP BY 1, 2
),
summary AS (
  SELECT c.source, c.shard, c.token, c.c - th.t AS residual, th.t
  FROM census c JOIN thresh th USING (source, shard)
  WHERE c.c > th.t
),
meta AS (SELECT source, CAST(sum(t) AS BIGINT) AS t_total FROM thresh GROUP BY 1),
merged AS (
  SELECT s.source, s.token,
         CAST(sum(s.residual + s.t) AS BIGINT) AS est_lo,
         CAST(sum(s.t) AS BIGINT) AS t_present
  FROM summary s GROUP BY 1, 2
),
bounds AS (
  SELECT m.source, m.token, m.est_lo,
         m.est_lo + mt.t_total - m.t_present AS est_hi
  FROM merged m JOIN meta mt USING (source)
),
top AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY est_lo DESC, token) AS rank
  FROM bounds QUALIFY rank <= {_TOPK_OUT}
),
exact AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY 1, 2
)
SELECT t.source, CAST(t.rank AS BIGINT) AS rank, t.token,
       t.est_lo, CAST(t.est_hi AS BIGINT) AS est_hi, e.exact_n
FROM top t JOIN exact e USING (source, token)
"""
QUERIES["topk_sketch_heavyhitters"] = (
    q_topk_sketch_heavyhitters,
    TOPK_SKETCH_HEAVYHITTERS_SQL,
)
