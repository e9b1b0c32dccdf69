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


def ranked_running_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    rank_col: str = "rank",
    cum_col: str = "cum",
    n_bands: int | None = None,
) -> DataFrame:
    """Global rank + running sum of ``value_col`` in ``order_cols``
    order, with NO partition-less Window — the banded two-pass pattern
    (same machinery as the SK engine, defaults/load.py:44):

    1. range-partition by the order key: bands are ordered, rows sort
       within bands in parallel;
    2. per-band rank/cumsum via a Window PARTITIONED by band (parallel —
       each band is one window group);
    3. one tiny per-band (count, sum) aggregate — ``n_bands`` rows —
       collected, prefix-summed on the driver, broadcast back as a
       literal-map projection. The collect is O(bands), never O(rows).

    A plain ``Window.orderBy(...)`` computes the same thing through ONE
    task sorting every row — fine at 10⁴ rows, fatal at 10⁸ (a
    web-scale vocabulary). ``order_cols`` must be a total order (unique
    key) for deterministic ranks; ``value_col`` must be integral/long
    (driver prefix sums are exact Python ints).
    """
    spark = df.sparkSession
    if n_bands is None:
        n_bands = spark.sparkContext.defaultParallelism
    # The band assignment MUST be frozen: RangePartitioner's boundary
    # sampling is seeded by rdd.id (a global counter), so a RE-EXECUTION
    # of repartitionByRange draws different boundaries than the run the
    # offsets below were collected from — overlapping/gapped global
    # ranks. Invisible below ~20·bands rows per partition (the "sample"
    # is the whole partition, boundaries identical regardless of seed);
    # found REAL by the sf1 oracle spot-check (equidepth ranks had
    # 47,492 distinct of 50,000). localCheckpoint(eager) materializes
    # the banded rows once — the stats job and every later action on
    # the returned plan read the SAME bands — and its blocks are freed
    # by the ContextCleaner when the caller drops the result.
    banded = (
        df.repartitionByRange(n_bands, *order_cols)
        .withColumn("__band", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__band").orderBy(*order_cols)
    local = banded.withColumn("__rn_l", F.row_number().over(w)).withColumn(
        "__cum_l",
        F.sum(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    stats = {
        r["b"]: (r["n"], r["s"])
        for r in banded.groupBy(F.col("__band").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s"))
        .collect()
    }
    # no unpersist: the checkpoint blocks ARE the band assignment —
    # releasing them would reintroduce the divergent-recompute bug; the
    # ContextCleaner frees them once the caller drops the returned plan
    rn_off: dict[int, int] = {}
    cum_off: dict[int, int] = {}
    acc_n, acc_s = 0, 0
    for b in sorted(stats):
        rn_off[b], cum_off[b] = acc_n, acc_s
        acc_n += stats[b][0]
        acc_s += int(stats[b][1])

    def _lit_map(d: dict[int, int]):
        return F.create_map(*[F.lit(x) for b in sorted(d) for x in (b, d[b])])

    if not stats:  # empty input: rank/cum columns still present
        return (
            df.withColumn(rank_col, F.lit(None).cast("int"))
            .withColumn(cum_col, F.lit(None).cast("long"))
        )
    return (
        local.withColumn(
            rank_col,
            (F.element_at(_lit_map(rn_off), F.col("__band")) + F.col("__rn_l")).cast("int"),
        )
        .withColumn(
            cum_col,
            F.element_at(_lit_map(cum_off), F.col("__band")).cast("long")
            + F.col("__cum_l").cast("long"),
        )
        .drop("__band", "__rn_l", "__cum_l")
    )


def quantile_filter(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.25,
    hi_q: float = 0.75,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the [lo_q, hi_q]
    quantile band of its group's distribution — percentile-driven
    outlier trimming (drop the longest/shortest tail of each language,
    clip score outliers per source) where fixed thresholds won't
    transfer across strata.

    Two passes, both cheap: one grouped exact-percentile aggregate
    (group count rows — strata are bounded, see ``grouped_quantiles``),
    broadcast back onto the corpus as an equi-join (or a literal
    crossJoin for the ungrouped scalar), then a codegen filter. The
    corpus itself never shuffles.

    Exactness note: both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` use R-7 linear interpolation, and for quantiles
    whose binary representation is exact (0.25, 0.5, 0.75) the
    interpolated bound is bit-identical across engines — use those for
    cross-engine-reproducible pipelines.
    """
    qs = F.percentile(
        F.col(value_col).cast("double"),
        F.array(F.lit(float(lo_q)), F.lit(float(hi_q))),
    ).alias("__qs")
    if group_cols:
        # null-safe join: a NULL stratum key is a legitimate group
        # (percentile aggregates it like any other); a plain equi-join
        # would silently remove its rows (NULL != NULL)
        bounds = df.groupBy(*group_cols).agg(qs)
        for c in group_cols:
            bounds = bounds.withColumnRenamed(c, f"__g_{c}")
        cond = None
        for c in group_cols:
            piece = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = piece if cond is None else cond & piece
        out = df.join(F.broadcast(bounds), cond).drop(
            *[f"__g_{c}" for c in group_cols]
        )
    else:
        out = df.crossJoin(F.broadcast(df.agg(qs)))
    return out.filter(
        (F.col(value_col).cast("double") >= F.element_at("__qs", 1))
        & (F.col(value_col).cast("double") <= F.element_at("__qs", 2))
    ).drop("__qs")


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    qs: list[float] | None = None,
    labels: list[str] | None = None,
    group_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row a quantile bucket of its group's ``value_col``
    distribution — the CCNet head/middle/tail split (Wenzek et al.
    2020 bucket documents by LM perplexity per language and train on
    the head): rows at or below the first cut are the first bucket,
    and so on, with NULL values keeping a NULL bucket.

    Deliberately NOT ntile(): an exact ntile needs a per-group total
    order, and Window.partitionBy(lang) puts an entire language in ONE
    partition — a scale-killer for any real stratum. Instead this is
    the ``quantile_filter`` shape: one grouped exact-percentile
    aggregate (bounded output), broadcast back, then a codegen CASE —
    the corpus never shuffles and there is no window anywhere.

    Cross-engine exactness: default cuts [0.25, 0.75] — quantiles whose
    binary representation is exact interpolate bit-identically in
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` (see
    ``quantile_filter``); stick to dyadic quantiles for contract use.
    """
    qs = [0.25, 0.75] if qs is None else qs
    labels = labels or ["head", "middle", "tail"]
    if len(labels) != len(qs) + 1:
        raise ValueError("need len(qs)+1 labels")
    qcol = F.percentile(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(float(q)) for q in qs]),
    ).alias("__cuts")
    if group_cols:
        bounds = df.groupBy(*group_cols).agg(qcol)
        for c in group_cols:
            bounds = bounds.withColumnRenamed(c, f"__g_{c}")
        cond = None
        for c in group_cols:
            piece = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = piece if cond is None else cond & piece
        out = df.join(F.broadcast(bounds), cond).drop(
            *[f"__g_{c}" for c in group_cols]
        )
    else:
        out = df.crossJoin(F.broadcast(df.agg(qcol)))
    v = F.col(value_col).cast("double")
    expr = F.lit(labels[-1])
    for i in range(len(qs) - 1, -1, -1):
        expr = F.when(v <= F.element_at("__cuts", i + 1), F.lit(labels[i])).otherwise(
            expr
        )
    expr = F.when(v.isNull(), F.lit(None).cast("string")).otherwise(expr)
    return out.withColumn(bucket_col, expr).drop("__cuts")


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
    tiebreak_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Exact top-``n`` rows per group by ``order_col`` (ties broken by
    ``tiebreak_col`` ascending — a total order, so the result is
    deterministic) — "keep the N best documents per language" without
    putting an entire stratum in one partition.

    This is deliberately the PLAIN window + rank filter, because Spark
    3.5+/4 rewrites exactly this shape through the WindowGroupLimit
    rule: a partial group-limit runs BEFORE the exchange (map-side
    top-n per partition, so the shuffle carries ≤ n·partitions rows
    per group), and the final per-group task receives that bounded
    survivor set — never the whole stratum. Hand-rolling a salted
    two-level prune would duplicate the optimizer's work and add an
    exchange (measured: one extra shuffle, same result).
    ``tests/test_plans`` pins the partial WindowGroupLimit in the plan
    contract so a regression to a whole-stratum sort fails CI, not a
    cluster.

    Output: the original rows of the winners plus their 1-based
    ``rank``. Rows with a NULL ``order_col`` never rank (filtered
    up front — engines disagree on default null placement, and a NULL
    can't be a "top" value under either order).
    """
    from pyspark.sql import Window

    order = (
        [F.col(order_col).asc(), F.col(tiebreak_col).asc()]
        if ascending
        else [F.col(order_col).desc(), F.col(tiebreak_col).asc()]
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.filter(F.col(order_col).isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` (optionally per group):
    one map-side-combinable aggregation on floor(value / width) — the
    distribution-profiling companion to ``grouped_quantiles`` when you
    want the whole shape, not point estimates. FLOOR binning is
    engine-exact for the cross-engine contract (round-half is not).

    Output: (group_cols..., bin, bin_lo, n) with bin_lo = bin·width;
    NULL values fall out (no bin). Wire volume is O(bins) per
    partition — safe at any corpus size.
    """
    binc = F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width))).cast(
        "long"
    )
    keys = [*(group_cols or []), F.col("__bin").alias("bin")]
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__bin", binc)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *(group_cols or []),
            "bin",
            (F.col("bin") * F.lit(float(bin_width))).alias("bin_lo"),
            "n",
        )
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorized moments: clip ``value_col`` to the group's
    [p_lo, p_hi] exact percentiles, then report raw vs clipped means —
    the outlier-robust profiling step before feeding a metric into a
    quality threshold (a handful of broken rows shouldn't move the
    gate).

    Two passes, both scale-safe: (1) ``grouped_quantiles``'s exact
    percentile aggregate (one shuffle on the group key), (2) the clip +
    re-aggregate with the O(groups) percentile table BROADCAST back —
    the big side never shuffles twice. Means come from exact
    DECIMAL(18,6) sums (double addition is order-dependent; decimal is
    not) divided once at the end. Output: (group_cols..., n, lo, hi,
    n_clipped_lo, n_clipped_hi, mean_raw, mean_winsor), 6dp.
    """
    pcts = grouped_quantiles(df, group_cols, value_col, (p_lo, p_hi))
    lo_c, hi_c = _qname(p_lo), _qname(p_hi)
    v = F.col(value_col).cast("double")
    clipped = F.least(F.greatest(v, F.col(lo_c)), F.col(hi_c))
    return (
        df.join(F.broadcast(pcts), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first(lo_c), 6).alias("lo"),
            F.round(F.first(hi_c), 6).alias("hi"),
            F.sum((v < F.col(lo_c)).cast("long")).alias("n_clipped_lo"),
            F.sum((v > F.col(hi_c)).cast("long")).alias("n_clipped_hi"),
            F.sum(v.cast("decimal(18,6)")).alias("__sr"),
            F.sum(clipped.cast("decimal(18,6)")).alias("__sw"),
        )
        .select(
            *group_cols,
            "n",
            "lo",
            "hi",
            "n_clipped_lo",
            "n_clipped_hi",
            F.round(
                F.col("__sr").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean_raw"),
            F.round(
                F.col("__sw").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean_winsor"),
        )
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-depth (equal-count) histogram: rank every row in
    (value, tiebreak) total order, assign bucket = floor((rank−1)·B/N),
    and report each bucket's count and value bounds — the
    statistics-collection shape behind optimizer histograms and
    quantile-sketch validation.

    The global rank uses ``ranked_running_sum``'s banded two-pass
    pattern — range-partition, per-band window, O(bands) driver prefix
    sum — NOT a partition-less Window, so ranking 10⁹ rows spreads
    across all executors (betl_spark/defaults/load.py:44 machinery).
    floor((rank−1)·B/N) is pure integer arithmetic: engine-exact,
    unlike ntile's remainder-spreading, which is convention-dependent.

    Output: (bucket, n, lo, hi) — n differs by ≤1 across buckets.
    """
    ranked = ranked_running_sum(
        df.select(
            F.col(value_col).alias("__val"),
            F.col(tiebreak_col).alias("__tb"),
            F.lit(1).alias("__one"),
        ).where(F.col("__val").isNotNull()),
        ["__val", "__tb"],
        "__one",
        rank_col="__rank",
        cum_col="__cum",
    )
    total = ranked.agg(F.max("__cum").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            # Exact long arithmetic end-to-end: `/` would detour through
            # a double and can truncate differently from integer floor
            # once (rank−1)·B nears 2^53 (round-9 advisor item). DIV is
            # Spark's integral division — same semantics as DuckDB `//`
            # on non-negative operands.
            F.expr(
                f"(CAST(__rank AS BIGINT) - 1L) * {int(n_buckets)}L"
                " DIV __n"
            ).alias("bucket"),
            "__val",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__val").alias("lo"),
            F.max("__val").alias("hi"),
        )
    )


def grouped_pearson(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
    x_scale: int = 6,
    y_scale: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation from EXACT moment sums:
    r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)).

    One map-side-combinable aggregation per group — never a builtin
    ``corr`` (whose double accumulation is partition-order-dependent
    and thus not reproducible across engines). x and y quantize to
    fixed decimal scales (pass the data's natural precision; the
    products x·y, x², y² are then EXACT decimals), the five sums
    accumulate exactly, and r is one engine-identical IEEE expression
    over their double casts. Double casts stay exact while a group's
    Σ(x·y)·10^(x_scale+y_scale) < 2⁵³ — size the scales to the data,
    not smaller (e.g. 2dp money × integer counts wants scales (2, 0),
    giving ~10¹³ headroom per trillion-row group).

    ``x_col``/``y_col`` accept names or Column expressions. Groups
    with no variance in either variable yield NULL r. Output:
    (group_cols..., n, r) with r rounded 6dp.
    """
    x = (x_col if not isinstance(x_col, str) else F.col(x_col)).cast(
        f"decimal(18,{x_scale})"
    )
    y = (y_col if not isinstance(y_col, str) else F.col(y_col)).cast(
        f"decimal(18,{y_scale})"
    )
    both = x.isNotNull() & y.isNotNull()
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(F.when(both, x)).alias("__sx"),
        F.sum(F.when(both, y)).alias("__sy"),
        F.sum(F.when(both, (x * y).cast(f"decimal(30,{x_scale + y_scale})"))).alias("__sxy"),
        F.sum(F.when(both, (x * x).cast(f"decimal(30,{2 * x_scale})"))).alias("__sxx"),
        F.sum(F.when(both, (y * y).cast(f"decimal(30,{2 * y_scale})"))).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    r = F.when(
        (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
        F.round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6),
    )
    return agg.select(*group_cols, "n", r.alias("r"))


def ab_test_proportions(
    df: DataFrame,
    group_cols: list[str],
    variant_col,
    success_col,
) -> DataFrame:
    """Two-proportion z-test per group over a deterministic A/B split:
    z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled
    rate — the experiment-analysis readout over event logs. Pair it
    with ``sampling.hash_bucket`` for the assignment (deterministic
    md5 split, no RNG state).

    One grouped aggregation of four exact counts (successes/trials per
    variant), then a single engine-identical IEEE expression. Groups
    with an empty variant or a degenerate pooled rate (p̂ ∈ {0, 1})
    yield NULL z. Output: (group_cols..., n_a, n_b, conv_a 6dp,
    conv_b 6dp, z 6dp).
    """
    is_a = variant_col if not isinstance(variant_col, str) else F.col(variant_col)
    succ = success_col if not isinstance(success_col, str) else F.col(success_col)
    s = succ.cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, s).otherwise(0)).alias("__sa"),
        F.sum(F.when(~is_a, s).otherwise(0)).alias("__sb"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    p_a = F.col("__sa").cast("double") / n_a
    p_b = F.col("__sb").cast("double") / n_b
    pooled = (F.col("__sa") + F.col("__sb")).cast("double") / (n_a + n_b)
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    )
    z = F.when(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (pooled > F.lit(0.0))
        & (pooled < F.lit(1.0)),
        F.round((p_a - p_b) / se, 6),
    )
    # empty arms: NULL conversion rate, never a divide-by-zero (ANSI
    # mode throws; the CASE guard short-circuits the division)
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, F.round(p_a, 6)).alias("conv_a"),
        F.when(F.col("n_b") > 0, F.round(p_b, 6)).alias("conv_b"),
        z.alias("z"),
    )
