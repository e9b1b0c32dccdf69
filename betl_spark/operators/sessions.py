"""Batch sessionization: gap-based session assignment over an event log.

Beyond-reference scale surface (the reference has no event-stream
concepts; this is the batch face of ``streaming/events.py``'s
session_window — same 30-minute-gap semantics, computed retroactively
over a static log, which is how training pipelines sessionize
historical clickstreams).

Scale shape: ONE shuffle on the user key. The lag/cumulative-sum
windows and the per-session aggregation all share
``partitionBy(user)`` — hash-partitioning by user satisfies the
clustered distribution of the (user, session) groupBy, so Catalyst
reuses the single Exchange end-to-end. No global ordering anywhere:
each user's timeline sorts independently inside its partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-user session sequence number: a new session starts
    at the first event and whenever the gap since the previous event
    exceeds ``gap_seconds``. Adds ``session_seq`` (1-based, per user).

    ``order_cols`` breaks timestamp ties deterministically (defaults to
    the timestamp alone; pass e.g. an event id when timestamps repeat —
    the session ASSIGNMENT is tie-order-invariant because the gap test
    only sees the timestamp, but downstream first/last-in-session
    logic may not be).

    Events with a NULL timestamp are EXCLUDED: they have no position in
    any session, and engines disagree on where NULL sorts (Spark window
    ORDER BY puts nulls first, DuckDB last — the events-NULL sweep
    caught the divergence).
    """
    events = events.where(F.col(ts_col).isNotNull())
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    ts_s = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(ts_s).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_s - prev) > F.lit(gap_seconds)), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    value_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup of a sessionized log: (user, session_seq,
    session_start/end as epoch seconds, n_events [, total_value as
    DECIMAL-exact double]). One shuffle total — the groupBy reuses the
    sessionize window's user partitioning."""
    s = sessionize(events, user_col, ts_col, gap_seconds, order_cols)
    ts_s = F.unix_timestamp(F.col(ts_col))
    aggs = [
        F.min(ts_s).alias("session_start"),
        F.max(ts_s).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        # DECIMAL(18,2) sum, double at the end: double summation is
        # partition-order-dependent; exact-decimal keeps the result
        # bit-identical under any parallelism (module determinism rule)
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return s.groupBy(user_col, "session_seq").agg(*aggs)


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
) -> DataFrame:
    """First-order (Markov) transition matrix over per-key event
    sequences: for each observed (from_state, to_state) adjacency in a
    key's (ts, tiebreak)-ordered stream, the count and the
    row-normalized transition probability — the behavioral-analytics
    companion to sessionization (where do users go NEXT from each
    step).

    One ``lead`` window partitioned by key (parallel across keys, the
    same shape as sessionize) feeds one grouped count; the
    normalization total joins back broadcast (O(|states|) rows). The
    probability is a single exactly-rounded double division of two
    exact counts. NULL-timestamp events are excluded (no position in
    the sequence; NULL sort order differs across engines). Output:
    (from_state, to_state, n, prob 6dp).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    df = df.where(F.col(ts_col).isNotNull())
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("__tot").cast("double"), 6
        ).alias("prob"),
    )
