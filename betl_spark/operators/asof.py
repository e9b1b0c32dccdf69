"""As-of (point-in-time) join — a custom operator Spark has no native
primitive for (beyond-reference; the reference has only equi joins,
betl/dataflow/dfl_merge.py:5-54).

For each left row, attach the most recent right row whose timestamp is
<= the left row's timestamp, per key — the standard shape for "price
at trade time", "dimension version at event time", "last heartbeat
before the error".

Implementation is the UNION-WINDOW formulation, not a range join: tag
both sides, union them, and carry the right-side payload forward with
``last(..., ignorenulls=True)`` over a (key, time) window. One shuffle
on the key, linear in |left| + |right| — a range/non-equi join would
either cross-product per key or need interval bucketing. At 100 TB
this is the same plan a sort-merge as-of (pandas merge_asof,
QuestDB/kdb asof) runs distributed: co-partition by key, one ordered
scan per partition.

Ties: right rows order before left rows at the same timestamp, so the
match is inclusive (right_ts <= left_ts, matching DuckDB's ASOF JOIN).
For determinism the right side should be unique per (key, ts) —
pre-aggregate if it isn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus ``<value>_asof`` columns
    from the latest right row with ``right_ts <= left_ts`` per ``on``
    key (NULL when no prior right row exists)."""
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols not on right side: {missing}")
    internals = {"__t", "__side"} | {f"__r_{c}" for c in value_cols}
    reserved = internals & set(left.columns)
    if reserved:
        raise ValueError(f"left columns collide with internals: {sorted(reserved)}")
    left_payload = [c for c in left.columns if c not in on]
    r_types = {c: right.schema[c].dataType for c in value_cols}
    l_types = {c: left.schema[c].dataType for c in left_payload}

    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *left_payload,
        *[F.lit(None).cast(r_types[c]).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        *on,
        "__side",
        *left_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
