"""User-journey analytics over event logs: conversion funnels and
cohort retention.

Beyond-reference scale surface (the reference has no event concepts) —
the two standard clickstream questions a warehouse built on this
engine gets asked: "how many users made it through view → click →
purchase (within a bound)?" and "of the users who arrived in week W,
how many were still active k weeks later?".

Both operators are single-aggregation shapes — no per-user windows, no
self-joins over the event log:

- ``funnel_users`` collects each user's per-step timestamp lists in ONE
  groupBy(user) (map-side combinable; per-user arrays are bounded by
  that user's own activity) and resolves the strictly-increasing step
  chain with array HOFs — pure codegen after the single shuffle.
- ``cohort_retention`` is two groupBys that share the user-key
  exchange plus one bounded (cohort, offset) aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def funnel_users(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts: Column,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """Per-user funnel resolution: step i's timestamp is the MINIMUM
    event time of step i that is STRICTLY AFTER the resolved step i−1
    time (and, with ``within``, at most ``within`` ts-units after step
    1 — pass microseconds if ``ts`` is epoch-micros). A missing step
    nulls the rest of the chain; ``steps_completed`` counts the prefix
    reached.

    ``ts`` is any monotone numeric event-time expression (use the
    contract's type-adaptive ``ts_micros``). Min-of-filtered-list is
    collection-order-invariant, so the collect_list needs no sort and
    the result is deterministic under any partitioning.

    Output: (user, step1_ts..stepK_ts, steps_completed).
    """
    ev = events.select(
        F.col(user_col),
        F.col(type_col).alias("__et"),
        ts.cast("long").alias("__ts"),
    )
    aggs = [
        F.collect_list(F.when(F.col("__et") == s, F.col("__ts"))).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    per_user = ev.groupBy(user_col).agg(*aggs)
    # single-arg lambda factory: a 2-arg lambda would be read by
    # PySpark's HOF machinery as the (value, index) form, silently
    # binding the second parameter to the array index
    def after(prev: Column):
        if within is None:
            return lambda x: x > prev
        return lambda x: (x > prev) & (
            x <= F.col("step1_ts") + F.lit(within)
        )

    t_cols: list[Column] = [F.array_min("__a0")]
    for i in range(1, len(steps)):
        t_cols.append(
            F.array_min(F.filter(F.col(f"__a{i}"), after(F.col(f"step{i}_ts"))))
        )
    out = per_user
    for i, c in enumerate(t_cols):
        out = out.withColumn(f"step{i + 1}_ts", c)
    completed = None
    for i in range(len(steps)):
        piece = F.when(F.col(f"step{i + 1}_ts").isNotNull(), 1).otherwise(0)
        completed = piece if completed is None else completed + piece
    return out.select(
        user_col,
        *[f"step{i + 1}_ts" for i in range(len(steps))],
        completed.cast("int").alias("steps_completed"),
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts: Column,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """The funnel report: how many users reached each step. One extra
    explode + bounded groupBy (K·users rows max) on top of
    ``funnel_users``. Output: (step_idx 1-based, step_name, n_users).
    """
    per_user = funnel_users(events, user_col, type_col, ts, steps, within)
    names = F.array(*[F.lit(s) for s in steps])
    return (
        per_user.filter(F.col("steps_completed") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.col("steps_completed"))
            ).alias("step_idx")
        )
        .groupBy("step_idx")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "step_idx",
            F.element_at(names, F.col("step_idx")).alias("step_name"),
            "n_users",
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts: Column,
    period: int,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their FIRST event (period = floor(ts / period), e.g. epoch-week
    for micros ts and period=7·86400·10⁶), and each (cohort,
    period_offset) cell counts the cohort's users active in that later
    period, with the retention rate against the cohort size.

    Scale shape: distinct (user, period) and first-event-per-user are
    two groupBys sharing the user-key exchange; cohort sizes are a
    bounded aggregate broadcast back.

    Period binning is exact integer arithmetic — ``(ts - pmod(ts,
    period)) / period`` on BIGINT with the division done in DECIMAL
    (the numerator is an exact multiple of ``period``, so the quotient
    is an exact integer). Epoch-micros (~1.7e18) exceed a double's
    53-bit exact-integer range, so the earlier floor(double/period)
    form could mis-bin events within ~256µs of a period boundary; the
    oracle replays the same integer form.

    Output: (cohort_period, period_offset, n_users, cohort_size,
    retention_rate 6dp).
    """
    tsl = ts.cast("long")
    p = (
        (tsl - F.pmod(tsl, F.lit(period))).cast("decimal(38,0)")
        / F.lit(period)
    ).cast("long")
    ev = events.select(F.col(user_col), p.alias("__p"))
    first = ev.groupBy(user_col).agg(F.min("__p").alias("cohort_period"))
    active = ev.distinct()
    cells = (
        active.join(first, user_col)
        .groupBy(
            "cohort_period",
            (F.col("__p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    sizes = first.groupBy("cohort_period").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_users",
        "cohort_size",
        F.round(
            F.col("n_users").cast("double") / F.col("cohort_size"), 6
        ).alias("retention_rate"),
    )


def funnel_latency(
    df: DataFrame,
    user_col: str,
    ts_micros_col: str,
    event_col: str,
    from_event: str,
    to_event: str,
) -> DataFrame:
    """Conversion-latency distribution: for each user, the time from
    their FIRST ``from_event`` to their first ``to_event`` AT OR AFTER
    it, summarized as exact quantiles + decimal-exact mean — the
    "how long from signup to purchase" readout a funnel report pairs
    with its conversion rate.

    Two grouped MINs per user (one shuffle on the user key — the
    conditional aggregates share one pass), a codegen filter for
    converted users, then one global summary row: n_from users,
    n_converted, conversion rate, and latency stats in seconds
    (p25/p50/p75/p95 via the exact R-7 percentile, mean from an exact
    integer-microsecond sum). Latency 0 (same-timestamp conversion)
    counts as converted. NULL-timestamp and NULL-user events are
    excluded.

    Output: one row (n_from, n_converted, conversion_rate 6dp,
    mean_latency_sec 6dp, p25_sec, p50_sec, p75_sec, p95_sec 6dp).
    """
    t = F.col(ts_micros_col).cast("long")
    base = df.where(
        t.isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(event_col).isin([from_event, to_event])
    ).select(
        F.col(user_col).alias("__u"),
        t.alias("__t"),
        F.col(event_col).alias("__e"),
    )
    per_user = base.groupBy("__u").agg(
        F.min(F.when(F.col("__e") == from_event, F.col("__t"))).alias(
            "__t_from"
        ),
    )
    # first to_event at/after the user's first from_event: a second
    # conditional min against the joined-back threshold (broadcast-free:
    # same user-key partitioning as the first aggregate)
    joined = base.where(F.col("__e") == to_event).join(
        per_user.where(F.col("__t_from").isNotNull()), "__u"
    )
    conv = joined.where(F.col("__t") >= F.col("__t_from")).groupBy(
        "__u", "__t_from"
    ).agg(F.min("__t").alias("__t_to"))
    lat = conv.select(
        "__u", (F.col("__t_to") - F.col("__t_from")).alias("__lat_us")
    )
    n_from = per_user.where(F.col("__t_from").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_from")
    )
    stats = lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.sum("__lat_us").alias("__sum_us"),
        F.percentile(
            F.col("__lat_us").cast("double"),
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)),
        ).alias("__qs"),
    )
    out = n_from.crossJoin(F.broadcast(stats))
    sec = lambda i: F.round(
        F.element_at("__qs", i) / F.lit(1e6), 6
    )
    return out.select(
        F.col("n_from").cast("long").alias("n_from"),
        "n_converted",
        F.when(
            F.col("n_from") > 0,
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_from").cast("double"),
                6,
            ),
        ).alias("conversion_rate"),
        F.when(
            F.col("n_converted") > 0,
            F.round(
                F.col("__sum_us").cast("double")
                / F.col("n_converted").cast("double")
                / F.lit(1e6),
                6,
            ),
        ).alias("mean_latency_sec"),
        sec(1).alias("p25_sec"),
        sec(2).alias("p50_sec"),
        sec(3).alias("p75_sec"),
        sec(4).alias("p95_sec"),
    )
