"""Range (interval) join — the second join shape Spark lacks a native
primitive for (beyond-reference; the reference joins only on equality,
betl/dataflow/dfl_merge.py:5-54).

``interval_join`` matches points to the intervals containing them
(start <= t < end): events to incident windows, readings to
calibration periods, trades to auction phases.

A naive non-equi join is a per-partition cross product; the scale
formulation BUCKETS time: every interval replicates to each
``bucket_width`` slot it overlaps, points land in exactly one slot,
and the match becomes an equi-join on the slot plus a residual range
filter. Each (point, interval) pair meets in exactly one bucket (the
point's), so no dedup pass is needed. Cost: |points| + Σ interval
spans / bucket_width join rows, shuffled on the bucket key — pick
``bucket_width`` near the typical interval length so replication
stays O(1) per interval (AQE absorbs hot buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to every interval with
    ``start <= point_ts < end``. Output: all point columns + all
    interval columns. Zero-length or inverted intervals match nothing
    (filtered, not an error — the half-open contract makes them empty
    sets)."""
    if bucket_width <= 0:
        raise ValueError(
            f"bucket_width={bucket_width} must be positive: DIV 0 yields NULL "
            "buckets and would silently drop every match"
        )
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share column names {sorted(overlap)}; "
            "rename one side — the joined output keeps both sides' columns"
        )
    pb = points.withColumn("__bucket", F.expr(f"{point_ts} DIV {bucket_width}"))
    ib = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{start_col} DIV {bucket_width}"),
                    F.expr(f"({end_col} - 1) DIV {bucket_width}"),
                )
            ),
        )
    )
    return (
        pb.join(ib, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__bucket")
    )
