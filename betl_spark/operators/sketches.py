"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark-4 ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
surface) — the 100 TB pattern for distinct-count reporting: scan the
data ONCE per ingest window, persist a tiny per-group sketch row, and
answer every coarser rollup (day → week → month → all-time; per-type →
global) by UNIONING sketches — never rescanning the fact table.

Why sketches and not ``count_distinct`` at scale:

- exact distinct is a full shuffle of the distinct keys per grouping
  set, re-paid for EVERY rollup grain; a sketch table is written once
  at the finest grain and every coarser grain is a cheap union-agg of
  kilobyte blobs (HLL_4 at lgK=12 is ≤ ~2.5 KB per group, fixed);
- HLL union is LOSSLESS with respect to the accuracy contract: the
  union of per-part sketches estimates the unioned data inside the
  same error band as a direct sketch would (property-pinned in the
  contract — ``sketch_rollup_mergeable``). It is not register-exact
  in general — DataSketches HLL promotes sparse→dense at
  data-dependent points, so the two estimates can differ by a
  fraction of the band (the unit suite pins the closeness);
- estimate error is bounded and deterministic for a given dataset
  (DataSketches HLL is not seeded per-run): relative std error
  ~1.04/sqrt(2^lgK) ≈ 1.6% at the default lgK=12. The accuracy
  contract (``sketch_distinct_accuracy``) pins the estimate within a
  deterministic band of the EXACT count that the DuckDB oracle
  computes independently.

Reference parity note: the reference engine (betl) has no
approximate/sketch surface — this module is part of the
beyond-reference training-data tier, alongside dedup/similarity. It
exists because its exact counterpart (one hash agg per grain) is the
thing that stops scaling first on 100 TB distinct-user questions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: DataSketches HLL default log2(registers): rse ~1.04/sqrt(4096) ≈ 1.6%
DEFAULT_LGK = 12


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build the finest-grain sketch table: one row per group with a
    mergeable HLL sketch (binary) of the distinct ``value_col``
    values. ONE hash aggregate — the single scan the whole rollup
    hierarchy is amortized over. Persist this (parquet keeps the
    binary column) as the daily/partition sketch table."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(int(lgk))).alias(sketch_col)
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Roll sketches up to a coarser grain: group by the surviving
    keys and UNION the sketches. Input is the (tiny) sketch table, so
    this shuffles kilobytes per group however large the underlying
    fact data was."""
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def estimate_distinct(
    sketches: DataFrame,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Materialize the distinct-count estimate column from a sketch
    column (pure projection; keeps the sketch for further rollups)."""
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(sketch_col).cast("long")
    )


# ---- family 2: mergeable fixed-bin histogram sketches (quantiles) ----
# (round-13 verdict ask #7: percentile_approx answers per-query but is
# not mergeable — the HLL pattern "scan once, persist tiny per-group
# state, roll up forever" had no quantile counterpart. An equi-width
# bin-count vector IS that counterpart: counts are EXACT (the only
# approximation is value position within a bin, bounded by bin width),
# and the merge is a vector sum — lossless, associative, commutative,
# so per-day sketch tables roll up to any coarser grain with bit-exact
# equality to the direct histogram. Trade vs KLL/t-digest: a fixed
# [lo, hi) domain must be chosen up front (out-of-range mass lands in
# tracked under/overflow bins, where a quantile answer degrades to
# "below lo"/"above hi" honestly), in exchange for exact integer
# determinism the cross-engine oracle can replay.)

#: default equi-width bin count: 64 in-range bins + underflow(0) +
#: overflow(n_bins+1) → a 66-element long vector, ~0.5 KB per group
DEFAULT_N_BINS = 64


def histogram_bin(
    value_col, lo: float, hi: float, n_bins: int = DEFAULT_N_BINS
) -> Column:
    """Bin index (int) for one value: 0 = underflow (< lo), 1..n_bins
    = in-range equi-width bins over [lo, hi), n_bins+1 = overflow
    (>= hi). The in-range index is
    ``least(n_bins-1, greatest(0, floor((v - lo) * n_bins / (hi - lo)))) + 1``
    — multiply-before-divide, then clamp: the clamp absorbs the one
    case where division rounds up to exactly n_bins for v just under
    hi, and the expression is plain IEEE double arithmetic in a fixed
    operation order so an independent engine (the DuckDB oracle)
    computes the identical index for every value
    (:func:`histogram_bin_sql` is the shared text)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    raw = F.floor(
        (c - F.lit(float(lo))) * F.lit(float(n_bins)) / F.lit(float(hi - lo))
    )
    return (
        F.when(c < F.lit(float(lo)), F.lit(0))
        .when(c >= F.lit(float(hi)), F.lit(int(n_bins) + 1))
        .otherwise(
            F.least(F.lit(int(n_bins) - 1), F.greatest(F.lit(0), raw)) + 1
        )
        .cast("int")
    )


def histogram_bin_sql(
    value_sql: str, lo: float, hi: float, n_bins: int = DEFAULT_N_BINS
) -> str:
    """The oracle's side of :func:`histogram_bin`: one SQL text both
    dialects accept, with the same literals and operation order, so
    the floating-point bin index is engine-independent."""
    return (
        f"CASE WHEN {value_sql} < {float(lo)!r} THEN 0 "
        f"WHEN {value_sql} >= {float(hi)!r} THEN {int(n_bins) + 1} "
        f"ELSE CAST(least({int(n_bins) - 1}, greatest(0, "
        f"floor(({value_sql} - {float(lo)!r}) * {float(n_bins)!r} "
        f"/ {float(hi - lo)!r}))) AS BIGINT) + 1 END"
    )


def _densify(
    census: DataFrame,
    group_cols: list[str],
    n_bins: int,
    bins_col: str,
) -> DataFrame:
    """(group, __bin, __n) census rows -> one dense ``array<long>`` of
    length n_bins+2 per group (missing bins are zero). The map lookup
    is try_element_at (ANSI-safe: absent key -> NULL -> 0)."""
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("__bin"), F.col("__n")))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_bins) + 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("long"),
    )
    return (
        census.groupBy(*group_cols)
        .agg(m.alias("__m"))
        .select(*group_cols, dense.alias(bins_col))
    )


def histogram_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = DEFAULT_N_BINS,
    bins_col: str = "hist_bins",
) -> DataFrame:
    """Build the finest-grain histogram sketch table: one row per
    group with a dense ``array<long>`` of n_bins+2 bin counts
    (underflow, n_bins equi-width bins over [lo, hi), overflow) of the
    non-NULL ``value_col`` values. ONE fact-table scan: a hash
    aggregate at (group, bin) grain, then a sketch-grain assembly agg
    — the same amortization contract as :func:`sketch_distinct`.
    Persist this (parquet keeps the array) as the daily sketch table."""
    c = F.col(value_col)
    census = (
        df.where(c.isNotNull())
        .groupBy(
            *group_cols,
            histogram_bin(c, lo, hi, n_bins).alias("__bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return _densify(census, group_cols, n_bins, bins_col)


def merge_histograms(
    sketches: DataFrame,
    group_cols: list[str],
    n_bins: int = DEFAULT_N_BINS,
    bins_col: str = "hist_bins",
) -> DataFrame:
    """Roll histogram sketches up to a coarser grain: elementwise
    vector sum of the bin-count arrays — EXACT (integer sums), so the
    rollup is bit-identical to a direct histogram of the unioned data
    however the input was partitioned. Runs at sketch grain
    (posexplode -> sum per (group, bin) -> reassemble): kilobytes per
    group through the shuffle, never the fact table, and no per-group
    collect_list of day vectors (a group's day count is unbounded at
    100 TB; its BIN count is fixed)."""
    ex = sketches.select(
        *group_cols, F.posexplode(bins_col).alias("__bin", "__x")
    )
    census = ex.groupBy(*group_cols, "__bin").agg(
        F.sum("__x").alias("__n")
    )
    return _densify(census, group_cols, n_bins, bins_col)


def histogram_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    ps_pct: list[int],
    lo: float,
    hi: float,
    n_bins: int = DEFAULT_N_BINS,
    bins_col: str = "hist_bins",
) -> DataFrame:
    """Quantile answers from a histogram sketch table: per group and
    percentile p, the FIRST bin whose cumulative count reaches the
    target rank (exact integer predicate ``100*cum >= p*n`` — no
    doubles in the selection), with its value edges. Output one row
    per (group, p): ``<group_cols>, p_pct, n_values, bin, bin_lo,
    bin_hi`` where ``bin_lo``/``bin_hi`` are the bin's value edges
    (NULL for the unbounded side of the underflow/overflow bins). The
    true p-quantile value lies in [bin_lo, bin_hi] by construction —
    bin width is the value-error bound.

    Plan shape: everything runs at SKETCH grain — one posexplode, a
    cumulative window PARTITIONED BY the group (never a global
    single-partition sort), and a per-(group, p) argmin as
    ``min(struct(bin))`` — so cost is |groups| x bins regardless of
    fact size."""
    from pyspark.sql import Window

    ex = sketches.select(
        *group_cols, F.posexplode(bins_col).alias("bin", "__n")
    )
    w = Window.partitionBy(*group_cols).orderBy("bin")
    wall = Window.partitionBy(*group_cols)
    cum = ex.withColumn("__cum", F.sum("__n").over(w)).withColumn(
        "n_values", F.sum("__n").over(wall)
    )
    ps = F.explode(
        F.array(*[F.lit(int(p)) for p in ps_pct])
    ).alias("p_pct")
    cand = cum.select(*group_cols, "bin", "__cum", "n_values", ps).where(
        (F.col("__cum") * 100 >= F.col("p_pct") * F.col("n_values"))
        & (F.col("n_values") > 0)
    )
    best = cand.groupBy(*group_cols, "p_pct", "n_values").agg(
        F.min("bin").cast("long").alias("bin")
    )
    width = float(hi - lo) / float(n_bins)
    bin_lo = F.when(
        F.col("bin") == 0, F.lit(None).cast("double")
    ).otherwise(
        F.when(F.col("bin") == int(n_bins) + 1, F.lit(float(hi))).otherwise(
            F.lit(float(lo)) + (F.col("bin") - 1) * F.lit(width)
        )
    )
    bin_hi = F.when(
        F.col("bin") == int(n_bins) + 1, F.lit(None).cast("double")
    ).otherwise(
        F.when(F.col("bin") == 0, F.lit(float(lo))).otherwise(
            F.lit(float(lo)) + F.col("bin") * F.lit(width)
        )
    )
    return best.select(
        *group_cols,
        F.col("p_pct").cast("long").alias("p_pct"),
        "n_values",
        "bin",
        bin_lo.alias("bin_lo"),
        bin_hi.alias("bin_hi"),
    )


# ---- family 3: mergeable heavy-hitter (top-k) sketches ----
# (completing the trio: distinct counts (HLL), quantiles (histogram),
# and now frequent items. The OFFLINE Misra-Gries summary: per
# partition, census the items, find the (m+1)-th largest count T, and
# keep each item's count ABOVE that threshold — at most m rows plus
# one meta row carrying T. Unlike streaming MG, the offline form is
# fully deterministic (T is a value at a fixed position of the sorted
# count multiset — order-independent even under count ties), every
# quantity is an exact integer, and the whole construction is plain
# SQL an independent engine can replay — so the contract value-matches
# summaries, bounds, and ranks rather than pinning booleans. Merging
# summaries across partitions gives exact bounds per item:
#   true count in a partition where the item IS in the summary is
#   exactly residual + T (residual = count - T);
#   in a partition where it is NOT, it is between 0 and T;
# so  lo = Σ_present (residual + T)  <=  true  <=  lo + Σ_absent T.
# The classic guarantee follows: any item with true count > Σ T over
# all partitions MUST appear in at least one summary. ~m rows per
# partition persisted, rolled up forever — the 100 TB "top tokens /
# top URLs per corpus slice" pattern without re-scanning the facts.)

#: default Misra-Gries budget: summaries keep at most m items whose
#: count strictly exceeds the (m+1)-th largest
DEFAULT_TOPK_M = 16


def topk_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    m: int = DEFAULT_TOPK_M,
) -> DataFrame:
    """Offline Misra-Gries summary at the finest grain: one row per
    kept item ``(<group_cols>, item, residual, t)`` with
    ``residual = count - t > 0``, plus one meta row per group
    (``item`` NULL, ``residual`` 0) carrying ``t`` so rollups can
    account for partitions an item was truncated from. ``t`` is the
    (m+1)-th largest item count in the group (0 when the group has
    <= m distinct items — the summary is then the exact census).

    Plan shape: one hash aggregate over the facts (the census), then a
    group-partitioned row_number at census grain to locate t — never a
    global sort — and a broadcast-sized join of the per-group t back
    to the census."""
    from pyspark.sql import Window

    census = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(*group_cols, F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__c").desc(), F.col("item")
    )
    ranked = census.withColumn("__rn", F.row_number().over(w))
    t_tbl = ranked.groupBy(*group_cols).agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == int(m) + 1, F.col("__c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("t")
    )
    kept = (
        census.join(t_tbl, list(group_cols))
        .where(F.col("__c") > F.col("t"))
        .select(
            *group_cols,
            "item",
            (F.col("__c") - F.col("t")).alias("residual"),
            "t",
        )
    )
    meta = t_tbl.select(
        *group_cols,
        F.lit(None).cast(kept.schema["item"].dataType).alias("item"),
        F.lit(0).cast("long").alias("residual"),
        "t",
    )
    return kept.unionByName(meta)


def merge_topk_sketches(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Roll heavy-hitter summaries up to a coarser grain (the finer
    partition columns are simply absent from ``group_cols``): exact
    integer count bounds per surviving item —
    ``(<group_cols>, item, est_lo, est_hi)`` with
    ``est_lo <= true count <= est_hi`` (see the family note; both
    bounds are sums of summary integers, no estimation). Runs at
    sketch grain: kilobytes per group through the shuffle."""
    meta = (
        sketches.where(F.col("item").isNull())
        .groupBy(*group_cols)
        .agg(F.sum("t").cast("long").alias("__t_total"))
    )
    items = (
        sketches.where(F.col("item").isNotNull())
        .groupBy(*group_cols, "item")
        .agg(
            F.sum(F.col("residual") + F.col("t")).cast("long").alias("est_lo"),
            F.sum("t").cast("long").alias("__t_present"),
        )
    )
    return items.join(meta, list(group_cols)).select(
        *group_cols,
        "item",
        "est_lo",
        (F.col("est_lo") + F.col("__t_total") - F.col("__t_present"))
        .cast("long")
        .alias("est_hi"),
    )


# ---- family 4: bottom-k (KMV) sketches — mergeable distinct sample ----
# (the fourth mergeable per-group summary shape: HLL answers "how
# many distinct", the histogram "what distribution", Misra-Gries
# "which items dominate" — bottom-k answers "show me a uniform sample
# of the distinct values, and how many there are", from one persisted
# sketch. The k distinct values with the SMALLEST hashes are a
# uniform-without-replacement sample of the distinct-value set
# (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007 "On synopses for
# distinct-value estimation"), and the merge is LOSSLESS-EXACT, not
# just error-preserving: the k smallest hashes of a union are always
# among the union of each part's k smallest, so sharded build + merge
# is bit-identical to a direct global build — the contract proves it
# by having Spark take the sharded path while the oracle computes the
# direct one. The cardinality estimator is the classic
# (k-1)/u_(k) with u the hash normalized into [0,1); with a 48-bit
# integer hash that is floor((k-1)*2^48 / h_(k)) — EXACT INTEGER
# arithmetic (relative std error ~1/sqrt(k-2)), and a group with
# fewer than k distinct values degrades to the exact census.)

#: 48-bit hash space: 12 md5 hex chars. (k-1)*2^48 fits a long for
#: any practical k (k=1024 -> 2.9e17 << 2^63), so the estimator stays
#: in exact integer arithmetic both engines replay identically.
KMV_HASH_SPACE = 1 << 48

#: default bottom-k budget: rse ~1/sqrt(k-2) ~= 13% at k=64
DEFAULT_KMV_K = 64


def kmv_hash(col) -> Column:
    """48-bit uniform hash of a value: first 12 hex chars of md5 of
    the string form, as a non-negative long. The DuckDB oracle replays
    it as ``CAST('0x' || substr(md5(v), 1, 12) AS BIGINT)`` — parity
    is pinned by test on literal values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """Build the finest-grain bottom-k sketch table: per group, the
    <= k distinct ``value_col`` values with the smallest 48-bit hashes
    — ``(<group_cols>, item (string), h (long))``. ONE hash aggregate
    (the distinct) then a group-partitioned row_number ordered by
    ``(h, item)``; the ``rn <= k`` filter is rewritten by Spark's
    WindowGroupLimit rule into a map-side partial group-limit, so only
    <= k rows per group per input partition reach the shuffle — the
    build never sorts a group's full distinct set in one place
    (plan-pinned in ``tests/test_plans.py``)."""
    from pyspark.sql import Window

    cand = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).cast("string").alias("item"))
        .distinct()
        .withColumn("h", kmv_hash(F.col("item")))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc(), F.col("item").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def merge_kmv_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """Roll bottom-k sketches up to a coarser grain: dedupe items and
    re-take the k smallest hashes per surviving group. EXACT: the
    result is bit-identical to a direct :func:`kmv_sketch` of the
    unioned data (any globally-bottom-k hash is bottom-k within its
    own shard, so it survives into the merge input). Runs at sketch
    grain — <= k rows per group per shard through the shuffle."""
    from pyspark.sql import Window

    cand = sketches.select(*group_cols, "item", "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc(), F.col("item").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def kmv_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch table:
    ``(<group_cols>, n_kept, h_k, distinct_est)``. When the group kept
    fewer than k rows the sketch IS the distinct set (est = n_kept,
    h_k the largest kept hash); otherwise the KMV estimator
    ``floor((k-1) * 2^48 / h_k)`` with h_k the k-th smallest hash —
    exact integer arithmetic end to end (``div``), replayed verbatim
    by the oracle."""
    c_num = (int(k) - 1) * KMV_HASH_SPACE
    agg = sketches.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    return agg.withColumn(
        "distinct_est",
        F.when(F.col("n_kept") < int(k), F.col("n_kept")).otherwise(
            F.expr(f"{c_num} div greatest(h_k, CAST(1 AS BIGINT))")
        ),
    )


# ---- family 5: Bloom-filter membership sketches (bit_or-mergeable) ----
# (the fifth shape: "have we seen this key?" — the incremental-dedup /
# decontamination membership primitive. A fixed m-bit filter as an
# array<long> of m/64 words: build = one hash aggregate of OR'd
# single-bit words, merge = elementwise bit_or — associative and
# commutative, so per-shard filters roll up BIT-IDENTICAL to a direct
# build (the contract proves it the same way as KMV: Spark takes the
# sharded path, the oracle the direct one). Probes have NO false
# negatives by construction; false positives are deterministic for a
# given dataset because the j bit positions come from md5 — the FP
# census is therefore an exact value-matched integer fact, not a
# bound pin. Sizing rule (documented, measured in the ladder): FPR
# ~= (1 - e^(-j*n/m))^j — a fixed 2 KB filter is honest at n ~= 1e3
# keys and saturates visibly by n ~= 1e5; production sizes m to the
# expected key count per group (the array length is a parameter, and
# the plan shape is identical at any m).)

#: default filter geometry: 256 longs = 16384 bits (2 KB/group), 3 hashes
DEFAULT_BLOOM_WORDS = 256
DEFAULT_BLOOM_HASHES = 3


def bloom_positions(col, n_words: int, n_hashes: int) -> list[Column]:
    """The j bit positions (0 .. 64*n_words-1) of one key: position i
    is the 48-bit md5 hash of ``'<i>:' || key`` modulo the bit count.
    Independent salted hashes, identical text in the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    m_bits = 64 * int(n_words)
    return [
        (kmv_hash(F.concat(F.lit(f"{i}:"), c.cast("string"))) % m_bits)
        for i in range(int(n_hashes))
    ]


def bloom_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    n_words: int = DEFAULT_BLOOM_WORDS,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
    bits_col: str = "bloom_bits",
) -> DataFrame:
    """Build the finest-grain Bloom filter table: one row per group
    with an ``array<long>`` of ``n_words`` words whose bits cover the
    group's keys. Plan: project each key to j (word, single-bit-mask)
    pairs (a j-element explode — row growth j, no shuffle), ONE hash
    aggregate at (group, word) grain OR-ing the masks, then the same
    sketch-grain densify as the histogram family. Persist as the
    daily/shard filter table."""
    from betl_spark.operators.util import ensure_parallelism

    pos = F.explode(
        F.array(*bloom_positions(key_col, n_words, n_hashes))
    ).alias("__pos")
    # j seeded md5 hashes per key: the standard one-split parallelism
    # guard on the hash-heavy map pass (no-op at real scale)
    exploded = ensure_parallelism(
        df.where(F.col(key_col).isNotNull())
    ).select(*group_cols, pos)
    words = (
        exploded.select(
            *group_cols,
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__m"),
        )
        .groupBy(*group_cols, "__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_words) - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("long"),
    )
    return (
        words.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__w"), F.col("__bits")))
            ).alias("__m")
        )
        .select(*group_cols, dense.alias(bits_col))
    )


def merge_bloom_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    n_words: int = DEFAULT_BLOOM_WORDS,
    bits_col: str = "bloom_bits",
) -> DataFrame:
    """Roll Bloom filters up to a coarser grain: elementwise bit_or of
    the word arrays — bit-identical to a direct build over the unioned
    keys, at sketch grain (posexplode -> bit_or per (group, word) ->
    reassemble; kilobytes per group through the shuffle)."""
    ex = sketches.select(
        *group_cols, F.posexplode(bits_col).alias("__w", "__x")
    )
    words = ex.groupBy(*group_cols, "__w").agg(F.bit_or("__x").alias("__bits"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_words) - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("long"),
    )
    return (
        words.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__w"), F.col("__bits")))
            ).alias("__m")
        )
        .select(*group_cols, dense.alias(bits_col))
    )


def bloom_probe(
    probes: DataFrame,
    filters: DataFrame,
    group_cols: list[str],
    key_col: str,
    n_words: int = DEFAULT_BLOOM_WORDS,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
    bits_col: str = "bloom_bits",
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test: join each probe row to its group's filter
    (BROADCAST — the filter table is kilobytes per group however big
    the underlying key set was; this is the point of the family: the
    100 TB probe side never shuffles) and flag rows whose j bits are
    all set. Bit extraction is ``(word >> (pos % 64)) & 1`` — the
    lowest bit after an arithmetic shift, sign-safe in both engines."""
    from betl_spark.operators.util import ensure_parallelism

    flt = F.broadcast(filters.select(*group_cols, bits_col))
    # probe-side hashing is j seeded md5s per row — same one-split
    # guard; the broadcast join keeps the probe side shuffle-free
    out = ensure_parallelism(probes).join(flt, list(group_cols), "left")
    pos_cols = []
    for i, p in enumerate(bloom_positions(key_col, n_words, n_hashes)):
        out = out.withColumn(f"__bp{i}", p)
        pos_cols.append(f"__bp{i}")
    checks = [
        F.coalesce(
            F.expr(
                f"(shiftright(try_element_at({bits_col}, "
                f"CAST({pc} div 64 AS INT) + 1), "
                f"CAST({pc} % 64 AS INT)) & 1) = 1"
            ),
            F.lit(False),
        )
        for pc in pos_cols
    ]
    hit = checks[0]
    for c in checks[1:]:
        hit = hit & c
    return out.withColumn(flag_col, hit).drop(bits_col, *pos_cols)
