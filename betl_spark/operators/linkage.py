"""Record linkage / entity resolution: blocked fuzzy matching.

The canonical ER pipeline at scale is (1) canonicalize → (2) BLOCK →
(3) pairwise-score only within blocks → (4) threshold. The naive
alternative — a cross join with an edit-distance filter — is O(n²)
rows through the shuffle and is exactly the shape that dies first at
100 TB; blocking bounds candidate pairs to Σ|block|², which the block
key's selectivity controls. Edit distance runs JVM-side
(``F.levenshtein`` — whole-stage codegen, no Python), so the scoring
stage is pure map work after the block-key shuffle.

A skewed block (one key holding a large share of rows) re-creates the
quadratic inside a single reducer — the same hazard as a skewed join
key; mitigation is a finer block function (conjunction of two keys) or
salting the block's self-join (operators/skew.py machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonicalize_names(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """Collapse exact-duplicate names before pairwise scoring: one row
    per distinct name with its lowest id as the canonical
    representative and the member count as weight. Cuts the fuzzy
    stage's input from |rows| to |name vocabulary| — on catalog-style
    data (64 distinct names across 20k parts) that is the difference
    between 4M candidate pairs and a few hundred.
    """
    return df.groupBy(F.col(name_col).alias("name")).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def fuzzy_join_blocked(
    names: DataFrame,
    block_expr,
    max_dist: int = 3,
) -> DataFrame:
    """All near-duplicate name pairs within a block:
    self-join ``names`` (from ``canonicalize_names``) on
    ``block_expr(name)``, keep pairs with
    ``levenshtein(a, b) <= max_dist``, ordered pair convention
    (name_a < name_b) so each pair appears once.

    Output: (block, name_a, name_b, id_a, id_b, n_members_a,
    n_members_b, dist).
    """
    sides = names.select(
        block_expr(F.col("name")).alias("block"),
        "name",
        "canonical_id",
        "n_members",
    )
    a = sides.alias("a")
    b = sides.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.canonical_id").alias("id_a"),
            F.col("b.canonical_id").alias("id_b"),
            F.col("a.n_members").alias("n_members_a"),
            F.col("b.n_members").alias("n_members_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        )
        .where(F.col("dist") <= F.lit(int(max_dist)))
    )


def first_token_block(col) -> F.Column:
    """Default block key: the name's first whitespace token (catalog
    names lead with their most discriminative attribute)."""
    return F.split_part(col, F.lit(" "), F.lit(1))
