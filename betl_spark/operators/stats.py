"""Distribution statistics for corpus analysis: exact grouped
quantiles (doc-length / score distributions per language, source,
shard — the profiling step before setting quality-filter thresholds).

Scale shape: ``percentile`` is Spark's exact percentile aggregate —
a typed-aggregate that buffers each group's values on the REDUCER for
that group, after map-side partial aggregation of the counts. Groups
parallelize across reducers (one shuffle on the group key); within a
group the cost is the group's cardinality. For percentiles of a
100 TB UNGROUPED column, switch to ``approx_percentile`` — the exact
form is for grouped profiling where each group fits a reducer (doc
lengths per language/source: millions of longs = tens of MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact linear-interpolation quantiles of ``value_col`` per group:
    one row per group, one ``p<q*100>`` column per requested quantile,
    rounded to 6dp (both Spark's ``percentile`` and DuckDB/Postgres
    ``quantile_cont``/``percentile_cont`` use the same R-7 linear
    interpolation, so results are engine-exact).
    """
    agg = df.groupBy(*group_cols).agg(
        F.percentile(
            F.col(value_col).cast("double"),
            F.array(*[F.lit(q) for q in quantiles]),
        ).alias("__qs")
    )
    cols = [F.col(c) for c in group_cols] + [
        F.round(F.element_at("__qs", i + 1), 6).alias(_qname(q))
        for i, q in enumerate(quantiles)
    ]
    return agg.select(*cols)


def _qname(q: float) -> str:
    pct = q * 100
    return f"p{pct:g}".replace(".", "_")
