"""Deterministic sampling & dataset splits for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/cluster sizes and
can't be oracle-checked; at 100 TB a corpus split must be a pure
function of a stable key so that (a) re-runs and backfills land every
document in the same split, (b) the split survives repartitioning, and
(c) membership is queryable from any engine. The standard trick:
bucket = md5(key) mod N, entirely JVM-side expressions (one narrow
projection, no shuffle, whole-stage codegen).

The reference has no sampling surface (its only row-subsetting is the
DATA_LIMIT_ROWS limit pushdown, betl/ConfClass.py:186-191); this is
beyond-reference scale surface, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_bucket(key_col: str, buckets: int = 100) -> F.Column:
    """Deterministic bucket 0..buckets-1 from the first 8 md5 hex chars
    of the key — stable across runs, partitionings, and engines
    (DuckDB replays it as CAST('0x'||substr(md5(k),1,8) AS BIGINT) % n).

    32 hash bits, not 16: with 16 bits and the hash_sample default of
    10000 buckets, 65536 % 10000 != 0 skewed low buckets by ~17% each
    (a systematic ~7% over-sample); mod-bias with 32 bits is ≤
    buckets/2^32 — sub-ppm for any sane bucket count."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, buckets: int = 10000) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. Unlike
    ``df.sample`` this is reproducible and join-stable: the same key is
    always in or always out, so sampled fact/dim subsets stay
    referentially consistent."""
    keep = int(round(fraction * buckets))
    return df.where(hash_bucket(key_col, buckets) < keep)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[s]`` of
    each stratum (e.g. rebalancing sources/languages in a training
    mix). Same pure-key-hash membership as ``hash_sample`` — join-stable
    and reproducible — with the threshold selected per row from the
    stratum column; strata not listed keep ``default_fraction``.
    Still one narrow projection: no shuffle, no per-stratum pass."""
    threshold = F.lit(int(round(default_fraction * buckets)))
    for s, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum_col) == s, F.lit(int(round(frac * buckets)))
        ).otherwise(threshold)
    return df.where(hash_bucket(key_col, buckets) < threshold)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign 'val' / 'test' / 'train' purely from the key hash
    (buckets of 1%). A document's split never changes as the corpus
    grows — only new keys land in new buckets."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct > 100:
        raise ValueError(
            f"val_pct={val_pct} + test_pct={test_pct} must be within [0, 100]"
        )
    b = hash_bucket(key_col, 100)
    return df.withColumn(
        split_col,
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )
