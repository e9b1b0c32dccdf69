"""Data-selection quality scoring for training-corpus curation.

``dsir_scores`` implements the scoring core of DSIR — Data Selection
with Importance Resampling (Xie et al. 2023, public: importance weights
from bag-of-hashed-n-gram language models of a target vs the raw
source) — the standard way to pick "looks like my target distribution"
documents out of a web-scale corpus without training a model.

Everything is deterministic md5-bucket hashing + two bounded-output
aggregations, so the DuckDB oracle replays it bit-for-bit (the same
contract discipline as ``corpus.lm_score``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hashed_ngram_features(
    df: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, __t, bucket) — one row per unigram and per adjacent bigram
    of the whitespace tokenization (``__t`` is the caller's boolean
    target flag, carried through so both distributions aggregate from
    ONE explode pass), hashed into ``buckets`` via the engine's shared
    ``sampling.hash_bucket`` (replayed by DuckDB as
    CAST('0x'||substr(md5(g),1,8) AS BIGINT) % B)."""
    from betl_spark.operators.sampling import hash_bucket

    # Deliberately NO one-split parallelism guard here (round-14's
    # one real self-inflicted regression, reverted in round 15): the
    # RoundRobin exchange ships — and sort-before-repartition first
    # SORTS — the full text column, and that costs more than the
    # hash pass saves (interleaved ABBA at sf0.1: guard ON min
    # 2.41s/med 2.77s vs OFF 1.64s/1.70s on dsir_scores; the same
    # +24-36% failure mode the lm family measured and rejected in
    # r14). At real scale the input has many splits and a guard
    # would be a no-op anyway, so removing it costs nothing there.
    toks = F.split(F.col(text_col), " ")
    uni = df.select(F.col(id_col), F.col("__t"), F.explode(toks).alias("__g"))
    bi = df.select(
        F.col(id_col),
        F.col("__t"),
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("__g"),
    )
    feats = uni.unionByName(bi)
    return feats.select(
        id_col, "__t", hash_bucket("__g", buckets).alias("bucket")
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance scoring: how much more likely is each document
    under the TARGET distribution's hashed-n-gram language model than
    under the raw source's.

    Feature model (Xie et al. §3, public): unigrams + bigrams hashed
    into ``buckets`` buckets; each distribution is the Laplace-smoothed
    bucket frequency p[b] = (c[b] + α) / (N + α·B). A document's raw
    DSIR log importance weight is Σ_g log(p_target[bucket(g)] /
    q_source[bucket(g)]) over its feature occurrences — computed here
    per (doc, bucket) count so the float sum runs over ≤B terms.

    Scale shape: the feature explode feeds ONE map-side-combinable
    groupBy((id, bucket)) — only (id, bucket, count) triples shuffle,
    never text. Both distributions aggregate to ≤B rows (B is the
    bitset knob, default 256; 10⁴–10⁶ in the paper) and meet in a
    B-row broadcast ratio table; the scoring join is therefore
    map-side, and the final per-doc reduce shuffles (id, term) pairs.
    No window, no driver collect, no all-pairs anything — at 100 TB
    this is two linear passes.

    Determinism: per-bucket log-ratio rounds to 9dp (ln agrees across
    engines to 1 ulp; the round makes it equal), then converts to
    exact integer nano-units so the per-doc accumulation is a BIGINT
    sum — order-free where a double sum's last ulp could flip the
    final 6dp round. The DuckDB oracle replays the identical integer
    arithmetic.

    Output: (id, n_feats, dsir_logratio) for EVERY input row; documents
    with no features (NULL text) keep n_feats=0 and a NULL score.
    Select with a threshold or ``stats.quantile_buckets`` downstream.
    """
    b = buckets
    feats = _hashed_ngram_features(
        df.withColumn("__t", F.coalesce(target, F.lit(False))),
        id_col,
        text_col,
        b,
    )
    # ONE explode pass: per-(doc, bucket) counts carry the target flag
    # (constant per doc), and both distributions' bucket counts derive
    # from this already-aggregated frame — the corpus text is read and
    # tokenized exactly once.
    doc_bucket = feats.groupBy(id_col, "__t", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    bucket_counts = doc_bucket.groupBy("bucket").agg(
        F.sum("c").alias("cq"),
        F.sum(F.when(F.col("__t"), F.col("c")).otherwise(0)).alias("cp"),
    )
    totals = bucket_counts.agg(
        F.sum("cq").alias("nq"), F.sum("cp").alias("np")
    )
    ratio = (
        bucket_counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("cp") + F.lit(alpha))
                    / (F.col("np") + F.lit(alpha) * F.lit(b))
                )
                - F.log(
                    (F.col("cq") + F.lit(alpha))
                    / (F.col("nq") + F.lit(alpha) * F.lit(b))
                ),
                9,
            ).alias("ratio"),
        )
    )
    # exact-integer accumulation: the 9dp-rounded ratio is identical in
    # both engines, so ratio·10⁹ rounds to the SAME bigint everywhere;
    # c·ratio_nanos sums exactly and order-free, where a double sum's
    # order-dependent last ulp can flip the 6dp round on boundary docs
    # (observed once at sf0.01 before this change)
    terms = doc_bucket.join(F.broadcast(ratio), "bucket").select(
        id_col,
        F.col("c"),
        (
            F.col("c")
            * F.round(F.col("ratio") * F.lit(1e9)).cast("long")
        ).alias("term_nanos"),
    )
    from betl_spark.operators.util import round6_nanos_ratio_expr

    # exact-integer final rounding (round6_nanos_ratio_expr): the old
    # F.round(sum/1e9, 6) diverged cross-engine on sums ending in
    # exactly ...500 nanos (true 6dp midpoints — found at sf3), and
    # needed a +0.0 signed-zero patch besides; the integral form has
    # neither hazard
    scores = terms.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_feats"),
        F.sum("term_nanos").alias("__sn"),
    ).select(
        id_col,
        "n_feats",
        round6_nanos_ratio_expr("__sn").alias("dsir_logratio"),
    )
    return (
        df.select(id_col)
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
            "dsir_logratio",
        )
    )


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    bias: float = 0.0,
    buckets: int = 1 << 16,
) -> DataFrame:
    """Apply an externally-trained hashed-bag-of-words linear
    classifier — the fastText-style quality-filter application step
    (public: Joulin et al. 2016; DCLM/FineWeb-Edu select pretraining
    documents with exactly this shape: hashed token features, linear
    head, sigmoid score).

    logit = bias + mean over tokens of w[bucket(token)] (missing
    buckets contribute 0), score = σ(logit). Training happens
    elsewhere; ``weights`` is a (bucket long, w double) frame — at any
    scale it is bounded by the bucket count, so it broadcasts and the
    corpus never shuffles for scoring: one explode feeds a broadcast
    join and a per-doc mean, (id, term) pairs being the only wire
    traffic.

    Determinism: per-token weights are exact table values quantized to
    integer nano-units, and the REPORTED 9dp logit is rounded in EXACT
    INTEGER arithmetic — |logit_nanos| = (2·|S + b·n| + n) DIV (2·n)
    (half away from zero) over the nano sum S, nano bias b and token
    count n — never by
    round(double, 9). A double round is engine-divergent at repr
    midpoints: Spark's F.round rounds the shortest DECIMAL repr
    through BigDecimal while DuckDB rounds the BINARY value, so the
    same double can round to adjacent 9dp values (found by the
    round-10 sf1 spot-check: 6 docs in 50k). σ applies to the exact
    logit and rounds to 6dp. Documents with no tokens (NULL text) keep
    a row with n_tokens=0 and score = σ(bias).

    Output: (id, n_tokens, logit, score).
    """
    from betl_spark.operators.sampling import hash_bucket
    from betl_spark.operators.util import ensure_parallelism

    # one md5 per token: same one-split parallelism guard as the
    # trainer's feature build (no-op at real scale; re-confirmed by
    # the r15 interleaved ABBA — ON min 3.88s vs OFF 4.10s on
    # classifier_train_score)
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    )
    # weights quantize to 9dp nano-units so the per-doc accumulation is
    # an order-free BIGINT sum (see dsir_scores determinism note)
    per_doc = (
        toks.select(id_col, hash_bucket("__tok", buckets).alias("bucket"))
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.round(F.coalesce("w", F.lit(0.0)) * F.lit(1e9)).cast("long")
            ).alias("__s"),
        )
    )
    b_n = int(round(float(bias) * 1e9))
    # HALF-AWAY-FROM-ZERO rounded mean-plus-bias in exact integers
    # (the HALF_UP convention every rounded column in the contract
    # uses): |logit_nanos| = (2·|S + b·n| + n) DIV (2·n) on positive
    # operands (DIV = floor there), sign reattached — all BIGINT, no
    # double detour anywhere before the final /1e9
    joined = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("__s", F.lit(0).cast("long")).alias("__s"),
        )
        .withColumn(
            "__a", F.col("__s") + F.lit(b_n) * F.col("n_tokens")
        )
        .withColumn(
            "__mag",
            F.expr(
                "(2 * abs(__a) + n_tokens) DIV (2 * greatest(n_tokens, 1))"
            ),
        )
        .withColumn(
            "__ln",
            F.when(F.col("n_tokens") == 0, F.lit(b_n)).otherwise(
                F.when(F.col("__a") < 0, -F.col("__mag")).otherwise(
                    F.col("__mag")
                )
            ),
        )
    )
    logit = F.col("__ln").cast("double") / F.lit(1e9)
    return joined.select(
        id_col,
        "n_tokens",
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )


def classifier_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    buckets: int = 1 << 16,
    iterations: int = 3,
    lr: float = 0.5,
    map_literal_max: int = 4096,
) -> DataFrame:
    """TRAIN the hashed-bag-of-words linear quality classifier that
    ``classifier_score`` applies — the in-engine half of the
    CCNet/fastText selection loop (public: Joulin et al. 2016;
    Wenzek et al. 2020 train exactly this shape to pick "looks like
    the target" documents). The reference has no trainable anything;
    this is a beyond-reference scale operator, the counterpart of what
    ``train_merges_distributed`` did for the tokenizer loop.

    Model and features match the scorer exactly, so the returned
    weight table drops straight into ``classifier_score``:
    tokens = split(text, ' ') (same tokenizer), feature x(d,b) =
    count_b(d)/n_tokens(d) (the scorer's mean-of-token-weights logit
    is exactly <x, w>), plus a constant bias feature at bucket -1
    (pass ``w[bucket=-1]`` as the scorer's ``bias``).

    Training is FULL-BATCH gradient descent on logistic loss for a
    fixed ``iterations`` — deterministic by construction, which is
    what makes it an oracle-checkable contract: there is no sample
    order, and ALL accumulator state is exact integers (nano-quantized
    features x9 = floor(c·1e9/n + .5), nano-quantized probabilities,
    BIGINT/DECIMAL(38,0) sums — the engine-agnostic order-free-sum
    discipline used throughout this repo), so an independent engine
    replaying the same arithmetic lands on the identical weight table.
    Floats appear only in σ(logit) and the lr·gradient step, both
    immediately re-quantized.

    Scale shape — the part that makes T iterations affordable at
    100 TB: the corpus is exploded and SHUFFLED EXACTLY ONCE, into a
    per-document feature-array table (doc, y, [(bucket, x9)…]) that is
    checkpointed. How the weight model reaches the executors then
    depends on its size (``map_literal_max``, advisor finding round 8:
    a 64k-bucket model as expression text approaches ~1 MB per
    iteration of parser/codegen cost):

    - ≤ ``map_literal_max`` entries (the contract's 256-bucket
      operating point): the model ships as a CONSTANT-FOLDED map
      literal inside the plan (``str_to_map`` of one literal string —
      the model-in-the-plan trick shared with the BPE merge chain and
      the SimHash hyperplanes); the per-doc logit/error is a row-local
      higher-order ``aggregate`` over the feature array (no shuffle,
      no join) and each iteration's only exchange is the map-side-
      combined per-bucket gradient (≤ buckets·partitions partials).
    - above it: the model becomes a BROADCAST-joined weight table —
      the exploded features left-join broadcast(weights) on bucket
      (zero expression-size cost, no corpus-side exchange for the
      lookup itself), per-doc error is a groupBy(doc) re-aggregation
      and the gradient joins that bounded per-doc error table back to
      the features. Two extra key exchanges per iteration, but each
      carries one row per document — never the corpus — and the
      arithmetic is bit-identical to the literal path (equality pinned
      by test at a forced threshold).

    The gradient collect is ≤ ``buckets`` rows either way — the same
    bounded-model collect as the centroid models and MDM write-back.
    The corpus is never collected and never reshuffled after the
    one-time feature build.

    Output: (bucket, w) — every feature bucket present in the corpus
    plus the bias row at bucket -1, w in units (nanos/1e9).
    """
    import math

    from betl_spark.operators.sampling import hash_bucket

    spark = df.sparkSession
    # the feature build is one md5 per TOKEN of the corpus — like
    # minhash_signatures, never let a one-split input serialize that
    # map pass on one core (no-op at real scale)
    from betl_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    # NULL labels train as 0 (the oracle's CASE WHEN ... THEN 1 ELSE 0
    # semantics) — a NULL would otherwise poison the whole gradient
    base = df.select(
        F.col(id_col),
        F.coalesce(label.cast("int"), F.lit(0)).alias("__y"),
        F.col(text_col),
    )
    toks = base.select(
        F.col(id_col),
        "__y",
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    )
    per_bucket = (
        toks.select(
            id_col, "__y", hash_bucket("__tok", buckets).alias("bucket")
        )
        .groupBy(id_col, "__y", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # one row per doc: nano-quantized features x9 = floor(c·1e9/n + .5)
    # derived inside the array (n = Σc is row-local), bias feature
    # appended; docs with no tokens (NULL text) still get the bias row
    n_tot = F.aggregate(
        "cs", F.lit(0).cast("long"), lambda acc, s: acc + s["c"]
    )
    doc_feats = (
        per_bucket.groupBy(id_col, "__y")
        .agg(F.collect_list(F.struct("bucket", "c")).alias("cs"))
        .select(
            id_col,
            "__y",
            F.transform(
                "cs",
                lambda s: F.struct(
                    s["bucket"].alias("bucket"),
                    F.floor(s["c"] * F.lit(1e9) / n_tot + F.lit(0.5))
                    .cast("long")
                    .alias("x9"),
                ),
            ).alias("fs"),
        )
    )
    bias_entry = F.array(
        F.struct(
            F.lit(-1).cast("long").alias("bucket"),
            F.lit(10**9).alias("x9"),
        )
    )
    from pyspark.sql import Observation

    # n_docs rides the checkpoint materialization as an observe()
    # side-output — no separate count job (the CC-round pattern)
    obs = Observation()
    f = (
        base.select(id_col, "__y")
        .join(doc_feats, [id_col, "__y"], "left")
        .select(
            id_col,
            "__y",
            F.concat(
                F.coalesce("fs", F.array().cast(
                    "array<struct<bucket:bigint,x9:bigint>>"
                )),
                bias_entry,
            ).alias("fs"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_docs = int(obs.get["n"])
    # NO per-iteration parallelism guard on the checkpointed feature
    # table (round-14 shipped one; round-15 removed it after the
    # driver flagged classifier_train in two consecutive sweeps and
    # two interleaved ABBA experiments read OFF faster on median —
    # ON med 3.72s/5.50s vs OFF 3.42s/4.71s). The per-iteration
    # RoundRobin exchange costs one extra shuffle of the feature
    # table per GD iteration, and the gradient's expensive expression
    # (the aggregate over fs with the model literal) runs on DOC-grain
    # rows — a few thousand at bench scale — so the parallelism it
    # bought was on the cheap exploded rows only. At real scale the
    # checkpoint inherits the corpus's partitioning and neither
    # variant exchanges anything.
    wn: dict[int, int] = {}
    den = 1.0e9 * n_docs
    dec = "decimal(38,0)"

    def _logit_err(S):
        # shared nano-quantization: identical in both model-shipping
        # paths, so they are interchangeable bit-for-bit
        logit = (
            F.floor(S.cast("double") / F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
        )
        p_nano = F.floor(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)) * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")
        return p_nano - F.col("__y").cast("long") * F.lit(10**9)

    fx = f.select(F.col(id_col), "__y", F.explode("fs").alias("s")).select(
        id_col,
        "__y",
        F.col("s")["bucket"].alias("bucket"),
        F.col("s")["x9"].alias("x9"),
    )
    for _ in range(iterations):
        if wn and len(wn) > map_literal_max:
            # large model: broadcast-join lookup (the str_to_map
            # literal would be O(model) expression text per iteration)
            wdf = df.sparkSession.createDataFrame(
                sorted(wn.items()), "bucket long, wn long"
            )
            per_doc = (
                fx.join(F.broadcast(wdf), "bucket", "left")
                .groupBy(id_col, "__y")
                .agg(
                    F.sum(
                        F.col("x9").cast(dec)
                        * F.coalesce("wn", F.lit(0)).cast(dec)
                    ).alias("S")
                )
            )
            err = per_doc.select(
                F.col(id_col), _logit_err(F.col("S")).alias("e9")
            )
            grads = (
                fx.join(err, id_col)
                .groupBy("bucket")
                .agg(
                    F.sum(
                        F.col("e9").cast(dec) * F.col("x9").cast(dec)
                    ).alias("G")
                )
                .collect()
            )
        else:
            if wn:
                # small model: rides the plan as one constant-folded
                # ARRAY literal indexed by bucket+1 (slot 0 = the bias
                # bucket -1) — no join, no per-doc exchange, and each
                # lookup is an O(1) array get. The previous
                # ``str_to_map`` literal was a linear scan of all
                # |model| STRING keys per feature entry (Catalyst map
                # literals have no hash index), measured ~1.1s/iter at
                # sf0.1 vs ~0.4s with the array (same values: integer
                # nanos either way, so S is bit-identical).
                warr_vals = [0] * (max(wn) + 2)
                for b, v in wn.items():
                    warr_vals[b + 1] = v
                warr = F.array(
                    *[F.lit(int(v)).cast("long") for v in warr_vals]
                )
                S = F.aggregate(
                    "fs",
                    F.lit(0).cast(dec),
                    lambda acc, s: acc
                    + s["x9"].cast(dec)
                    * F.coalesce(
                        F.get(warr, (s["bucket"] + 1).cast("int")),
                        F.lit(0),
                    ).cast(dec),
                )
            else:
                S = F.lit(0).cast(dec)
            grads = (
                f.select(_logit_err(S).alias("e9"), F.explode("fs").alias("s"))
                .groupBy(F.col("s")["bucket"].alias("bucket"))
                .agg(
                    F.sum(
                        F.col("e9").cast(dec) * F.col("s")["x9"].cast(dec)
                    ).alias("G")
                )
                .collect()
            )
        for r in grads:
            g = int(r["G"])
            wn[int(r["bucket"])] = wn.get(int(r["bucket"]), 0) - int(
                math.floor(lr * float(g) / den + 0.5)
            )
    return spark.createDataFrame(
        [(b, float(v) / 1e9) for b, v in sorted(wn.items())],
        "bucket long, w double",
    )
