"""Skew-handling operators: salting for hot-key joins and
heavy-hitter aggregation.

Spark's first line of defense is AQE (``spark.sql.adaptive.
skewJoin.enabled`` splits oversized shuffle partitions at runtime) and
map-side partial aggregation — both on by default in this engine's
session (betl_spark/session.py). Reach for manual salting only when:

- one join key holds a double-digit percentage of ALL rows (AQE splits
  a partition, but every split still collides on the same reducer key
  for sort-merge fallbacks), or
- the aggregation is not map-combinable (collect_list/set over hot
  keys) so partial agg can't shrink the hot partition.

``salted_join`` replicates the SMALL side n_salt× and fans the big
side out by a deterministic per-row salt — the hot key's rows spread
over n_salt reducers, at the cost of a small-side blowup that must
still broadcast-or-fit. The result set is bit-identical to the plain
join (the salt is internal), which is how the oracle checks it.

The reference has no skew machinery at all (single-node pandas); this
is pure scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salt_by: str, n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salt): xxhash64 of a named
    high-cardinality column (NOT rand() — retries/speculative tasks must
    produce the same salt or the join drops/duplicates rows)."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salt)))


def replicate(df: DataFrame, n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Cross the (small) side with salt values 0..n_salt-1 so every
    salted big-side row finds its match."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    return df.withColumn(col_name, salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_by: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s join keys are heavily skewed: join on
    (keys + salt) so each hot key spreads across ``n_salt`` partitions.

    ``salt_by`` names a high-cardinality column of ``big`` (e.g. the
    event/row id) used to derive the deterministic salt. Output columns
    = the plain join's (salt dropped).

    Big-side-preserving joins (inner/left/semi/anti) are accepted: every
    big-side row carries exactly ONE salt, so its match status equals
    the plain join's. Right/full joins are rejected — an unmatched
    SMALL-side key would survive once per salt replica (n_salt
    duplicate rows) — rather than silently wrong."""
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "semi",
                          "leftanti", "anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "right/full joins would emit unmatched small-side keys once "
            "per salt replica"
        )
    b = with_salt(big, salt_by, n_salt)
    s = replicate(small, n_salt)
    return b.join(s, on + ["_salt"], how).drop("_salt")
