"""Deterministic sampling & dataset splits for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/cluster sizes and
can't be oracle-checked; at 100 TB a corpus split must be a pure
function of a stable key so that (a) re-runs and backfills land every
document in the same split, (b) the split survives repartitioning, and
(c) membership is queryable from any engine. The standard trick:
bucket = md5(key) mod N, entirely JVM-side expressions (one narrow
projection, no shuffle, whole-stage codegen).

The reference has no sampling surface (its only row-subsetting is the
DATA_LIMIT_ROWS limit pushdown, betl/ConfClass.py:186-191); this is
beyond-reference scale surface, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_bucket(key_col: str, buckets: int = 100) -> F.Column:
    """Deterministic bucket 0..buckets-1 from the first 8 md5 hex chars
    of the key — stable across runs, partitionings, and engines
    (DuckDB replays it as CAST('0x'||substr(md5(k),1,8) AS BIGINT) % n).

    32 hash bits, not 16: with 16 bits and the hash_sample default of
    10000 buckets, 65536 % 10000 != 0 skewed low buckets by ~17% each
    (a systematic ~7% over-sample); mod-bias with 32 bits is ≤
    buckets/2^32 — sub-ppm for any sane bucket count."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, buckets: int = 10000) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. Unlike
    ``df.sample`` this is reproducible and join-stable: the same key is
    always in or always out, so sampled fact/dim subsets stay
    referentially consistent."""
    keep = int(round(fraction * buckets))
    return df.where(hash_bucket(key_col, buckets) < keep)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[s]`` of
    each stratum (e.g. rebalancing sources/languages in a training
    mix). Same pure-key-hash membership as ``hash_sample`` — join-stable
    and reproducible — with the threshold selected per row from the
    stratum column; strata not listed keep ``default_fraction``.
    Still one narrow projection: no shuffle, no per-stratum pass."""
    threshold = F.lit(int(round(default_fraction * buckets)))
    # NULL strata can never match an equality CASE arm (NULL == s is
    # NULL), so a None key would be dead weight — and Python can't even
    # sort None against str. Drop it here; NULL-stratum rows take
    # default_fraction like any unlisted stratum.
    for s, frac in sorted(
        (kv for kv in fractions.items() if kv[0] is not None)
    ):
        threshold = F.when(
            F.col(stratum_col) == s, F.lit(int(round(frac * buckets)))
        ).otherwise(threshold)
    return df.where(hash_bucket(key_col, buckets) < threshold)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign 'val' / 'test' / 'train' purely from the key hash
    (buckets of 1%). A document's split never changes as the corpus
    grows — only new keys land in new buckets."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct > 100:
        raise ValueError(
            f"val_pct={val_pct} + test_pct={test_pct} must be within [0, 100]"
        )
    b = hash_bucket(key_col, 100)
    return df.withColumn(
        split_col,
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep rates that hit a target mixture while retaining
    the maximum possible volume.

    Given observed stratum counts n_s and target mixture weights w_s,
    the max-volume solution keeps the LIMITING stratum (the one
    scarcest relative to its target) in full and downsamples everything
    else proportionally: C = min_s(n_s / w_s), rate_s = C·w_s / n_s —
    kept_s = C·w_s exactly matches the target proportions. Strata with
    no target weight get rate 0 (dropped from the mix). Pure driver
    arithmetic over #strata numbers — the data-side work is one
    aggregate + one hash-filter projection (``mixture_sample``).
    """
    present = {
        s: w
        for s, w in weights.items()
        if w > 0 and (counts.get(s) or 0) > 0  # None (all-NULL weights) and 0-mass strata drop
    }
    if not present:
        return {s: 0.0 for s in counts}
    limit = min(counts[s] / w for s, w in present.items())
    rates = {s: min(1.0, limit * w / counts[s]) for s, w in present.items()}
    rates.update({s: 0.0 for s in counts if s not in present})
    return rates


def mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    buckets: int = 10000,
    weight_col: str | None = None,
) -> DataFrame:
    """Rebalance a corpus to a target stratum mixture (domain / language
    weighting, the standard pre-training data-mix step) with
    deterministic, join-stable membership.

    One stratum-count aggregate (map-side combinable; the collect is
    O(strata) — domains/languages, bounded by definition), driver-side
    rate derivation (``mixture_rates``), then the same pure key-hash
    threshold filter as ``stratified_hash_sample`` — a single narrow
    projection over the corpus, no second shuffle, reproducible from
    any engine. Rates are floor-quantized to the bucket grid so an
    independent engine derives bit-identical membership (IEEE-double
    FLOOR agrees everywhere; round() at exact .5 does not).

    ``weight_col`` switches the mixture denominator from document count
    to a per-row weight SUM (token counts, byte sizes): training mixes
    are usually specified over TOKENS, and a stratum of few huge docs
    should count as big. Expected kept-weight per stratum then tracks
    w_s (hash sampling is uniform over keys, so kept weight ≈ rate ×
    total weight; exact only in expectation, unlike the doc-count
    mixture which is exact per key).
    """
    import math

    agg = (
        F.count(F.lit(1)).alias("n")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).alias("n")
    )
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s")).agg(agg).collect()
    }
    rates = mixture_rates(counts, weights)
    fractions = {
        s: math.floor(rate * buckets) / buckets for s, rate in rates.items()
    }
    return stratified_hash_sample(
        df, key_col, stratum_col, fractions, default_fraction=0.0, buckets=buckets
    )


def stratified_fixed_n(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    n: int,
) -> DataFrame:
    """EXACTLY-n deterministic sample per stratum. The fraction-based
    ``stratified_hash_sample`` keeps ~f·|s| rows (hash membership, so
    the count is approximate); evaluation sets, few-shot pools, and
    per-language probe sets need exactly N. Rows rank within their
    stratum by the key's md5-derived hash (uniform and
    engine-reproducible — the un-modded ``hash_bucket`` recipe) with
    the key itself as tiebreak, and rank ≤ n survive.

    Scale shape: this is ``stats.top_n_per_group`` under a hash order,
    so Spark's WindowGroupLimit rewrite applies — a map-side partial
    group-limit runs before the exchange and the shuffle carries ≤
    n·partitions rows per stratum, never the whole stratum. Output:
    the original rows + their 1-based ``rank``.

    NULL keys never rank: ``md5(NULL)`` is NULL, and
    ``top_n_per_group`` filters NULL order values up front (its
    documented rule). This is a CONTRACT, not an accident — a NULL key
    has no hash, so there is no engine-reproducible position for it
    (two NULL-key rows tie on every sort column, making any rank
    assignment nondeterministic in Spark AND in the oracle). The
    oracle SQL applies the same ``key IS NOT NULL`` filter, and the
    NULL-robustness suite injects NULL keys to pin the agreement.
    """
    from betl_spark.operators.stats import top_n_per_group

    if "__h" in df.columns:
        raise ValueError(
            "stratified_fixed_n uses an internal '__h' column; rename "
            "the caller's column (deterministic_shuffle precedent: "
            "raise, never silently clobber)"
        )
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("__h")
    )
    return top_n_per_group(
        df.select("*", h), [stratum_col], "__h", n, key_col, ascending=True
    ).drop("__h")


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    position_col: str = "position",
) -> DataFrame:
    """Seeded, engine-reproducible GLOBAL shuffle for training-data
    ordering: every row gets a (shard, position) such that reading
    shards in order yields a pseudo-random permutation that is a pure
    function of (key, seed) — re-runs, retries, and independent engines
    produce byte-identical order, unlike ``df.orderBy(rand())``.

    shard    = md5('<seed>:'+key)[1:8]  mod n_shards
    position = row_number within shard ordered by md5 hex [9:16]
               (a DIFFERENT hash window, so within-shard order does not
               correlate with shard assignment), key tiebreak.

    Scale shape: one exchange on shard + a per-shard sort — sorts run
    in parallel across shards and each sorts |corpus|/n_shards rows; no
    global sort, no single-reducer window (size n_shards to taste: more
    shards = smaller sorts). Output: input columns + (shard_col,
    position_col) — raises if either name already exists rather than
    silently clobbering a caller column.
    """
    for c in (shard_col, position_col):
        if c in df.columns:
            raise ValueError(
                f"output column {c!r} already exists; pass "
                "shard_col/position_col to rename (shard_assign pattern)"
            )
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    order = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(F.col("__ord"), F.col(key_col))
    return (
        df.withColumn(shard_col, shard)
        .withColumn("__ord", order)
        .withColumn(position_col, F.row_number().over(w).cast("long"))
        .drop("__ord")
    )


def mixture_with_repeats(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    budget: int,
    max_epochs: float = 4.0,
    weight_col: str | None = None,
    buckets: int = 10000,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Data-constrained mixture: hit a target volume ``budget`` (docs,
    or tokens via ``weight_col``) at target stratum ``weights`` by
    REPEATING scarce strata — the upsampling face of ``mixture_sample``
    (which only downsamples to the limiting stratum). Repetition is
    capped at ``max_epochs`` (beyond ~4 epochs repeated data stops
    helping — Muennighoff et al., "Scaling Data-Constrained Language
    Models", arXiv:2305.16264, public), so a stratum that cannot fill
    its target under the cap just contributes everything it has
    max_epochs times; the shortfall is visible in the epoch counts
    rather than silently rebalanced.

    Per stratum s with available volume T_s:
        epochs_s = min(max_epochs, w_s · budget / T_s)
    Every doc repeats floor(epochs_s) times, and a hash-deterministic
    frac(epochs_s) of keys (floor-quantized to the bucket grid, the
    ``hash_bucket`` recipe — reproducible from any engine) repeats one
    extra time. Output = input rows × repeats with ``epoch_col`` =
    1..n, so packing/shuffling downstream treats repeats as distinct
    rows. Strata without a positive weight are dropped.

    Scale shape: one stratum aggregate (map-side combinable, O(strata)
    collect — same bound as ``mixture_sample``), then a map-only
    explode(sequence) projection over the corpus: no join, no second
    shuffle, and the blow-up factor is bounded by ``max_epochs``.
    """
    agg = (
        F.count(F.lit(1)).alias("n")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).alias("n")
    )
    avail = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s")).agg(agg).collect()
    }
    import math

    n_full = F.lit(0)
    extra_th = F.lit(0)
    for s in sorted(weights):
        w, t = weights[s], avail.get(s) or 0
        if w <= 0 or t <= 0:
            continue
        epochs = min(float(max_epochs), w * budget / t)
        full = math.floor(epochs)
        th = math.floor((epochs - full) * buckets)
        n_full = F.when(F.col(stratum_col) == s, F.lit(int(full))).otherwise(n_full)
        extra_th = F.when(F.col(stratum_col) == s, F.lit(int(th))).otherwise(extra_th)
    # NULL keys hash to NULL; coalesce to the bucket count so the
    # extra-epoch test is FALSE (row still repeats floor(epochs) times)
    # — the same arithmetic the SQL oracle's CASE produces
    repeats = n_full + (
        F.coalesce(hash_bucket(key_col, buckets), F.lit(buckets)) < extra_th
    ).cast("int")
    return (
        df.withColumn("__rep", repeats)
        .filter(F.col("__rep") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("__rep"))))
        .drop("__rep")
    )


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int, shard_col: str = "shard"
) -> DataFrame:
    """Deterministic shard id 0..n_shards-1 from the key hash — the
    same engine-replayable md5 bucketing as ``hash_sample``, so a
    document's shard never changes across runs, repartitionings, or
    corpus growth (new keys spread uniformly; existing keys stay put)."""
    return df.withColumn(shard_col, hash_bucket(key_col, n_shards))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    order_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Materialize a corpus as exactly ``n_shards`` deterministic shard
    files — the packing/export step before a training run (readers
    stream shard_k=*/part-* independently; a doc's shard is a pure
    function of its key).

    Plan shape: one exchange keyed on the shard id co-locates each
    shard in one task, ``partitionBy`` splits the output by shard value
    — every shard directory gets exactly ONE file even when the hash
    lands two shards in the same task. ``order_cols`` sorts WITHIN each
    shard file (shard-local, parallel — a global sort would serialize
    the corpus; shard-local order is what sequence packing needs).
    At 100 TB pick n_shards ≈ corpus_bytes / target_file_size, not
    O(executors).
    """
    sharded = shard_assign(df, key_col, n_shards).repartition(
        n_shards, F.col("shard")
    )
    sort_cols = ["shard", *(order_cols or [key_col])]
    sharded = sharded.sortWithinPartitions(*sort_cols)
    (
        sharded.write.mode("overwrite" if mode == "replace" else mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def weighted_fixed_n(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """EXACTLY-n WEIGHTED sample without replacement per stratum —
    the weighted counterpart of ``stratified_fixed_n``, via the
    Efraimidis–Spirakis A-ES scheme (public: Efraimidis & Spirakis
    2006, "Weighted random sampling with a reservoir"): each row draws
    priority -ln(u)/w and the n smallest priorities per stratum win,
    which is distribution-identical to sequential weighted sampling
    without replacement. Token-weighted eval-set picks ("20 documents
    per language, odds ∝ token count") are exactly this.

    Determinism, engine-reproducible: u is the un-modded 32-bit md5
    window of the key mapped to (0, 1] (the ``hash_bucket`` recipe —
    no RNG, no seed state), the priority rounds to 9dp so independent
    engines agree at rounding boundaries, ties break on the key.
    Rules shared with ``stratified_fixed_n``: NULL keys never rank;
    rows with NULL or non-positive weight never rank (a weight ≤ 0 has
    no E-S priority).

    Scale shape: identical to ``stratified_fixed_n`` — the priority is
    one codegen expression, and ``top_n_per_group``'s window shape is
    rewritten by WindowGroupLimit (map-side partial group-limit, the
    shuffle carries ≤ n·partitions rows per stratum). Output: the
    original rows + 1-based ``rank``.
    """
    from betl_spark.operators.stats import top_n_per_group

    if "__pri" in df.columns:
        raise ValueError(
            "weighted_fixed_n uses an internal '__pri' column; rename "
            "the caller's column (deterministic_shuffle precedent: "
            "raise, never silently clobber)"
        )
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h + F.lit(1)) / F.lit(4294967297.0)
    pri = F.round(-F.log(u) / F.col(weight_col), 9).alias("__pri")
    base = df.filter(F.col(weight_col) > 0).select("*", pri)
    return top_n_per_group(
        base, [stratum_col], "__pri", n, key_col, ascending=True
    ).drop("__pri")


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment from the key's md5 hash (the
    ``hash_bucket`` split family): fold ∈ [0, k), stable across runs,
    partitionings and corpus growth — a key's fold never changes, so
    cross-validation re-runs see the same folds without any persisted
    assignment table. Rows with a NULL key get NULL fold (a NULL key
    cannot promise stability; filter or coalesce upstream).

    Pure projection (no shuffle); pair with a grouped aggregate for
    per-fold leakage/balance audits.
    """
    if k < 2:
        raise ValueError(f"kfold_assign: k must be >= 2, got {k}")
    return df.withColumn(fold_col, hash_bucket(key_col, k))


def temporal_split(
    df: DataFrame,
    ts_micros_col: str,
    train_pct: int = 70,
    val_pct: int = 15,
    split_col: str = "split",
) -> DataFrame:
    """Chronological train/val/test assignment — the split discipline
    for forecasting/recommendation corpora where a hash split would
    leak the future into training. Boundaries are exact integer
    arithmetic on the OBSERVED epoch range: cut_train = lo + span·p/100
    (span = hi − lo + 1, integer DIV), so both engines and every rerun
    place the same row on the same side. Rows with NULL timestamps get
    NULL split.

    One tiny min/max aggregate broadcast back as a 1-row crossJoin —
    the data itself never shuffles.
    """
    if train_pct <= 0 or val_pct < 0 or train_pct + val_pct >= 100:
        raise ValueError(
            f"temporal_split: need train_pct > 0, val_pct >= 0, "
            f"train+val < 100; got {train_pct}+{val_pct}"
        )
    t = F.col(ts_micros_col).cast("long")
    bounds = df.where(t.isNotNull()).agg(
        F.min(t).alias("__lo"), F.max(t).alias("__hi")
    )
    cut_train = F.col("__lo") + F.expr(
        f"(__hi - __lo + 1) * {int(train_pct)} DIV 100"
    )
    cut_val = F.col("__lo") + F.expr(
        f"(__hi - __lo + 1) * {int(train_pct) + int(val_pct)} DIV 100"
    )
    out = df.crossJoin(F.broadcast(bounds)).withColumn(
        split_col,
        F.when(t.isNull(), F.lit(None).cast("string"))
        .when(t < cut_train, F.lit("train"))
        .when(t < cut_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )
    return out.drop("__lo", "__hi")
