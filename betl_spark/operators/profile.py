"""Column profiling — the data-quality report a pipeline runs before
trusting a new drop of data (row/null/distinct counts, value range per
column). The reference's closest surface is its schema-descriptor
checks (/root/reference/betl/datamodel/TableClass.py); this is the
data-side complement, standard in any warehouse intake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """One profile row per column: (column, n_rows, n_null, n_distinct,
    min_value, max_value) with values compared AS STRINGS (cast before
    aggregation — deterministic binary UTF8 ordering in both engines;
    profile numerics separately if you need numeric ranges).

    Single pass: each row explodes into (column, value) pairs — a
    melt by explode(array(struct...)) rather than ``unpivot`` because
    unpivot's NULL behavior differs across engines — then one groupBy
    on the column name. Wire volume is rows×|cols| pairs; count/min/
    max combine map-side, the exact distinct does not. At 100 TB set
    ``exact_distinct=False`` to use approx_count_distinct (HLL, 5%
    default error, fully map-side-combinable) — the oracle contract
    uses the exact path.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    distinct_agg = (
        F.count_distinct(F.col("value"))
        if exact_distinct
        else F.approx_count_distinct(F.col("value"))
    )
    return pairs.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null"),
        distinct_agg.alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bin_width: float,
    alpha: float = 1.0,
) -> DataFrame:
    """Population Stability Index terms between two snapshots of a
    numeric column — the standard drift check before swapping a new
    corpus drop into a training mix (PSI < 0.1 stable, > 0.25 major
    shift is the usual reading). Per shared FLOOR bin:

        term = (p_a − p_b) · ln(p_a / p_b)

    with Laplace-smoothed proportions p = (n + α) / (N + α·B) so
    bins present in only one snapshot contribute a finite term; PSI is
    the sum of terms.

    Scale shape: two fixed-width histograms (map-side combinable, see
    ``histogram``) full-outer-joined on the bin — everything after the
    two scans is O(bins). The bin count B and totals ride in as a
    broadcast 1-row crossJoin. Terms round to 9dp (the ``lm_score``
    determinism discipline) so the DuckDB oracle replays bit-for-bit;
    sum and round the ``term`` column for the headline PSI.

    Output: (bin, bin_lo, n_a, n_b, term), one row per bin observed in
    either snapshot.
    """
    from betl_spark.operators.stats import histogram

    ha = histogram(df_a, value_col, bin_width).select(
        "bin", "bin_lo", F.col("n").alias("n_a")
    )
    hb = histogram(df_b, value_col, bin_width).select(
        "bin", F.col("n").alias("n_b")
    )
    joined = ha.join(hb, "bin", "full").select(
        "bin",
        F.coalesce(
            "bin_lo", F.col("bin") * F.lit(float(bin_width))
        ).alias("bin_lo"),
        F.coalesce("n_a", F.lit(0).cast("long")).alias("n_a"),
        F.coalesce("n_b", F.lit(0).cast("long")).alias("n_b"),
    )
    totals = joined.agg(
        F.sum("n_a").alias("ta"),
        F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("nbins"),
    )
    pa = (F.col("n_a") + F.lit(alpha)) / (
        F.col("ta") + F.lit(alpha) * F.col("nbins")
    )
    pb = (F.col("n_b") + F.lit(alpha)) / (
        F.col("tb") + F.lit(alpha) * F.col("nbins")
    )
    # ln rounds to 9dp BEFORE the product (the family determinism
    # discipline — see dsir_scores): p_a/p_b are exact-integer double
    # divisions (IEEE-identical everywhere); only ln can differ by an
    # ulp, and the pre-round removes it
    la, lb = F.round(F.log(pa), 9), F.round(F.log(pb), 9)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bin",
        "bin_lo",
        "n_a",
        "n_b",
        # + 0.0: signed-zero normalization (see quality.dsir_scores)
        (F.round((pa - pb) * (la - lb), 9) + F.lit(0.0)).alias("term"),
    )


def zorder_key(cols: list[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of ``len(cols)`` non-negative
    integer columns, ``bits`` low bits each — the multi-dimensional
    locality key behind clustered data layouts (public: Morton 1966;
    Delta Lake's OPTIMIZE ZORDER BY applies the same curve). Sorting or
    range-partitioning by this key co-locates rows that are close in
    EVERY dimension, so min/max parquet footer stats prune scans on
    any of the participating columns, not just the leading sort key.

    Pure bit arithmetic (shiftright/and/shiftleft over ≤ bits·|cols|
    terms) — whole-stage codegen, replayed exactly by the oracle.
    Callers normalize values into [0, 2^bits) first (clamped here).
    """
    n = len(cols)
    if bits * n > 63:  # bit 63 is the long sign bit: negative keys
        raise ValueError(  # would sort FIRST and break the curve
            f"bits*len(cols) must be <= 63, got {bits}*{n}"
        )
    out = F.lit(0).cast("long")
    cap = (1 << bits) - 1
    for j, c in enumerate(cols):
        v = F.least(F.greatest(F.col(c).cast("long"), F.lit(0)), F.lit(cap))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + j)
    return out


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    shards: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``shards`` parquet files clustered along the
    Z-order curve of ``cols``: range-partition on the interleaved key
    (one exchange, contiguous curve segments per shard), sort within
    each shard, drop the key. Downstream scans filtering on any of
    ``cols`` prune both whole files (footer min/max) and row groups.
    """
    key = zorder_key(cols, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(shards, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def check_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality gate: evaluate every rule in ONE
    aggregation pass over the table and report violations per rule —
    the expectations pattern (public: Great Expectations, dbt tests)
    the reference's schema checks stop short of.

    Each rule is a dict with ``name``, ``col`` and a ``type``:

    - ``not_null``                      — col must have no NULLs
    - ``unique``                        — col values must be distinct
                                          (NULLs don't count as dups)
    - ``range`` (``lo``/``hi`` opt.)    — numeric bounds, inclusive
    - ``in_set`` (``values``)           — value whitelist
    - ``regex`` (``pattern``)           — must match (rlike, partial)

    NULL semantics differ per rule type (and are overridable with a
    per-rule ``nulls_violate`` bool): ``range`` treats NULL as PASS by
    default (SQL comparison semantics — pair it with a ``not_null``
    rule if NULLs should fail), while ``in_set`` and ``regex`` treat
    NULL as a VIOLATION by default (a NULL is neither in the whitelist
    nor a regex match). Set ``nulls_violate: True`` on a ``range``
    rule to count NULLs as out-of-range, or ``False`` on
    ``in_set``/``regex`` to let NULLs pass.

    Scale shape: all rules compile into one ``agg`` — conditional
    counts combine map-side; each ``unique`` rule adds a distinct
    aggregate (Catalyst plans multi-distinct via Expand — fine for a
    handful of rules, and the alternative per-rule jobs would scan the
    table |rules| times). Output: (rule, column, n_violations, passed),
    one row per rule via an inline stack — O(rules) rows total.
    """
    aggs = []
    for r in rules:
        c, t = F.col(r["col"]), r["type"]
        if t == "not_null":
            v = F.count(F.when(c.isNull(), 1))
        elif t == "unique":
            v = F.count(c) - F.count_distinct(c)
        elif t == "range":
            cond = F.lit(False)
            if "lo" in r:
                cond = cond | (c < F.lit(r["lo"]))
            if "hi" in r:
                cond = cond | (c > F.lit(r["hi"]))
            if r.get("nulls_violate", False):
                cond = cond | c.isNull()
            v = F.count(F.when(cond, 1))
        elif t == "in_set":
            cond = ~c.isin(r["values"])
            if r.get("nulls_violate", True):
                cond = cond | c.isNull()
            v = F.count(F.when(cond, 1))
        elif t == "regex":
            cond = ~c.cast("string").rlike(r["pattern"])
            if r.get("nulls_violate", True):
                cond = cond | c.isNull()
            v = F.count(F.when(cond, 1))
        else:
            raise ValueError(f"unknown rule type: {t}")
        aggs.append(v.cast("long").alias(f"__v{len(aggs)}"))
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r["name"]).alias("rule"),
                        F.lit(r["col"]).alias("column"),
                        F.col(f"__v{i}").alias("n_violations"),
                    )
                    for i, r in enumerate(rules)
                ]
            )
        ).alias("s")
    )
    return stacked.select(
        "s.rule",
        "s.column",
        "s.n_violations",
        (F.col("s.n_violations") == 0).alias("passed"),
    )


def referential_integrity(
    specs: list[tuple[str, DataFrame, list[str], DataFrame, list[str]]],
) -> DataFrame:
    """Foreign-key orphan audit across a warehouse: for each
    (name, child, child_keys, parent, parent_keys) spec, count the
    child rows whose key has no parent — the referential-integrity
    health check a load pipeline runs before promoting a batch
    (betl's own loads assume intact NKs; this makes the assumption
    auditable).

    Each spec is one LEFT ANTI join against the DISTINCT parent keys
    (the distinct collapses the parent to its key cardinality before
    the shuffle; a small dimension broadcasts). Counts aggregate to
    one row per spec and union — the result is O(|specs|) rows, fully
    lazy (no driver-side counts). Child rows with a NULL key component
    are reported separately (NULL never matches a parent; conflating
    "missing parent" with "missing key" hides which upstream bug you
    have).

    Output: (relationship, n_child, n_null_key, n_orphans,
    orphan_rate 6dp of the non-null-keyed rows).
    """
    if not specs:
        raise ValueError(
            "referential_integrity: at least one "
            "(name, child, child_keys, parent, parent_keys) spec is "
            "required — an empty audit has no result schema to return"
        )
    outs = []
    for name, child, child_keys, parent, parent_keys in specs:
        ck = child.select(
            *[F.col(c) for c in child_keys],
        )
        non_null = ck.where(
            F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in child_keys))
        )
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
        ).distinct()
        orphans = non_null.join(pk, child_keys, "left_anti")
        counts = (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(non_null.agg(F.count(F.lit(1)).alias("__nn")))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
        )
        outs.append(
            counts.select(
                F.lit(name).alias("relationship"),
                "n_child",
                (F.col("n_child") - F.col("__nn")).alias("n_null_key"),
                "n_orphans",
                F.when(
                    F.col("__nn") > 0,
                    F.round(
                        F.col("n_orphans").cast("double")
                        / F.col("__nn").cast("double"),
                        6,
                    ),
                ).alias("orphan_rate"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    corpus snapshots: D = max over observed values of
    |CDF_a(v) − CDF_b(v)| — the distribution-shift companion to
    ``psi_drift`` that needs no binning choice (PSI's buckets can hide
    a shift that lands inside one bucket).

    Exact and engine-reproducible: per-value counts from two grouped
    censuses, a full-outer align on the value, cumulative counts
    through the banded two-pass rank machinery (``ranked_running_sum``
    twice — no partition-less Window even with billions of distinct
    values), and one final max over exactly-divided doubles. Output is
    a single row (n_a, n_b, n_values, ks_d).
    """
    from betl_spark.operators.stats import ranked_running_sum

    ca = df_a.where(F.col(value_col).isNotNull()).groupBy(
        F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("na"))
    cb = df_b.where(F.col(value_col).isNotNull()).groupBy(
        F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("nb"))
    merged = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    cum_a = ranked_running_sum(
        merged, ["v"], "na", rank_col="__r", cum_col="__ca"
    )
    cum_ab = ranked_running_sum(
        cum_a, ["v"], "nb", rank_col="__r2", cum_col="__cb"
    )
    totals = merged.agg(
        F.sum("na").alias("__ta"), F.sum("nb").alias("__tb")
    )
    # a one-sided comparison (either snapshot empty) has no defined D —
    # guard the divisions (ANSI mode turns 0/0 into a job abort) and
    # report NULL; a fully empty pair yields the single summary row
    # (0 values, NULL totals), matching the oracle's global aggregate
    d = F.when(
        (F.col("__ta") > 0) & (F.col("__tb") > 0),
        F.abs(
            F.col("__ca").cast("double") / F.col("__ta").cast("double")
            - F.col("__cb").cast("double") / F.col("__tb").cast("double")
        ),
    )
    return (
        cum_ab.crossJoin(F.broadcast(totals))
        .select(d.alias("__d"), "__ta", "__tb")
        .agg(
            F.first("__ta").alias("n_a"),
            F.first("__tb").alias("n_b"),
            F.count(F.lit(1)).alias("n_values"),
            F.round(F.max("__d"), round_to).alias("ks_d"),
        )
    )


def column_drift_audit(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Column-level drift audit between two snapshots of the same
    schema (yesterday's batch vs today's, first half vs second half of
    a backfill): per column, NULL rate and distinct cardinality on
    each side plus the rate delta — the cheap schema-health screen
    that catches an upstream feed silently starting to send NULLs or
    collapsing a dimension, before ``ks_drift``/``psi_drift`` level
    distribution analysis.

    One aggregate per side (every column's null count and approx-free
    exact distinct in a single pass each — 2 scans total, no shuffle
    of row data beyond the count-distinct), then a columns-long unpivot
    of two 1-row frames joined on the column name. O(|columns|) result
    rows.

    Output: (column, n_a, n_b, null_rate_a 6dp, null_rate_b 6dp,
    null_rate_delta 6dp, n_distinct_a, n_distinct_b).
    """
    if not columns:
        raise ValueError("column_drift_audit: at least one column required")

    def side(df: DataFrame, tag: str) -> DataFrame:
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
                for c in columns
            ],
            *[
                F.countDistinct(F.col(c)).alias(f"__dist_{c}")
                for c in columns
            ],
        )
        stack = ", ".join(
            f"'{c}', __null_{c}, __dist_{c}" for c in columns
        )
        return agg.select(
            F.col("__n").alias(f"n_{tag}"),
            F.expr(
                f"stack({len(columns)}, {stack}) AS "
                f"(column, __nulls_{tag}, n_distinct_{tag})"
            ),
        ).select(
            "column",
            f"n_{tag}",
            f"__nulls_{tag}",
            f"n_distinct_{tag}",
        )

    a = side(df_a, "a")
    b = side(df_b, "b")
    joined = a.join(b, "column", "full")
    rate = lambda nulls, n: F.when(
        F.col(n) > 0,
        F.round(F.col(nulls).cast("double") / F.col(n).cast("double"), 6),
    )
    ra = rate("__nulls_a", "n_a")
    rb = rate("__nulls_b", "n_b")
    return joined.select(
        "column",
        "n_a",
        "n_b",
        ra.alias("null_rate_a"),
        rb.alias("null_rate_b"),
        F.round(rb - ra, 6).alias("null_rate_delta"),
        "n_distinct_a",
        "n_distinct_b",
    )
