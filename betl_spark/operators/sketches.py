"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark-4 ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
surface) — the 100 TB pattern for distinct-count reporting: scan the
data ONCE per ingest window, persist a tiny per-group sketch row, and
answer every coarser rollup (day → week → month → all-time; per-type →
global) by UNIONING sketches — never rescanning the fact table.

Why sketches and not ``count_distinct`` at scale:

- exact distinct is a full shuffle of the distinct keys per grouping
  set, re-paid for EVERY rollup grain; a sketch table is written once
  at the finest grain and every coarser grain is a cheap union-agg of
  kilobyte blobs (HLL_4 at lgK=12 is ≤ ~2.5 KB per group, fixed);
- HLL union is LOSSLESS with respect to the accuracy contract: the
  union of per-part sketches estimates the unioned data inside the
  same error band as a direct sketch would (property-pinned in the
  contract — ``sketch_rollup_mergeable``). It is not register-exact
  in general — DataSketches HLL promotes sparse→dense at
  data-dependent points, so the two estimates can differ by a
  fraction of the band (the unit suite pins the closeness);
- estimate error is bounded and deterministic for a given dataset
  (DataSketches HLL is not seeded per-run): relative std error
  ~1.04/sqrt(2^lgK) ≈ 1.6% at the default lgK=12. The accuracy
  contract (``sketch_distinct_accuracy``) pins the estimate within a
  deterministic band of the EXACT count that the DuckDB oracle
  computes independently.

Reference parity note: the reference engine (betl) has no
approximate/sketch surface — this module is part of the
beyond-reference training-data tier, alongside dedup/similarity. It
exists because its exact counterpart (one hash agg per grain) is the
thing that stops scaling first on 100 TB distinct-user questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: DataSketches HLL default log2(registers): rse ~1.04/sqrt(4096) ≈ 1.6%
DEFAULT_LGK = 12


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build the finest-grain sketch table: one row per group with a
    mergeable HLL sketch (binary) of the distinct ``value_col``
    values. ONE hash aggregate — the single scan the whole rollup
    hierarchy is amortized over. Persist this (parquet keeps the
    binary column) as the daily/partition sketch table."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(int(lgk))).alias(sketch_col)
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Roll sketches up to a coarser grain: group by the surviving
    keys and UNION the sketches. Input is the (tiny) sketch table, so
    this shuffles kilobytes per group however large the underlying
    fact data was."""
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def estimate_distinct(
    sketches: DataFrame,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Materialize the distinct-count estimate column from a sketch
    column (pure projection; keeps the sketch for further rollups)."""
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(sketch_col).cast("long")
    )
