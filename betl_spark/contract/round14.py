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
