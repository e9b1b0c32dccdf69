"""Incremental (DELTA) change capture.

The reference DECLARES delta loads but never implemented them: the
NK-keyed full-outer-join classification algorithm exists only as
commented-out code (reference betl/defaultdataflows/stageExtract.py:
41-228 — the spec), and deltaLoadDimension/deltaLoadFact raise
"Code not yet written" (stageLoad.py:433-438). This module implements
that spec Spark-first:

classify(previous, incoming, nk, compare_cols) →
  one row per NK with change_op ∈ INSERT / UPDATE / DELETE / UNCHANGED,
  carrying the incoming values (or the previous values for DELETE).

The join shuffles both snapshots on the NK — the natural key — which is
also the partitioning a Delta-Lake/iceberg MERGE would use; downstream,
``apply_delta`` folds the classification into the previous snapshot to
produce the new one (the parquet-overwrite equivalent of MERGE INTO).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

CHANGE_COL = "change_op"


def classify_changes(
    previous: DataFrame,
    incoming: DataFrame,
    nk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """NK-keyed change classification (the stageExtract.py:95-118 spec).

    Null-safe comparison (``<=>``) so NULL→value and value→NULL both
    classify as UPDATE.
    """
    if compare_cols is None:
        compare_cols = [c for c in incoming.columns if c not in nk_cols]
    prev = previous.select(
        *nk_cols, *[F.col(c).alias(f"__prev_{c}") for c in compare_cols]
    ).withColumn("__in_prev", F.lit(1))
    inc = incoming.select(*nk_cols, *compare_cols).withColumn("__in_inc", F.lit(1))
    joined = prev.join(inc, on=list(nk_cols), how="full_outer")

    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__prev_{c}")) for c in compare_cols],
    )
    op = (
        F.when(F.col("__in_prev").isNull(), F.lit("INSERT"))
        .when(F.col("__in_inc").isNull(), F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
        .otherwise(F.lit("UNCHANGED"))
    )
    out_cols = [
        F.coalesce(F.col(c), F.col(f"__prev_{c}")).alias(c) for c in compare_cols
    ]
    return joined.select(*nk_cols, *out_cols, op.alias(CHANGE_COL))


def apply_delta(
    previous: DataFrame, changes: DataFrame, nk_cols: list[str]
) -> DataFrame:
    """Fold a classification into the previous snapshot → new snapshot
    (MERGE INTO semantics on plain parquet): DELETEs drop, UPDATEs and
    INSERTs take the incoming values, UNCHANGED keeps previous."""
    keep = changes.filter(F.col(CHANGE_COL) != "DELETE").drop(CHANGE_COL)
    return keep.select(previous.columns)
