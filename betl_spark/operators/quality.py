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
    scores = terms.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_feats"),
        F.round(F.sum("term_nanos") / F.lit(1e9), 6).alias("dsir_logratio"),
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

    Determinism: per-token weights are exact table values; the mean
    rounds to 9dp, σ applies to the rounded mean and rounds to 6dp
    (``lm_score`` discipline). Documents with no tokens (NULL text)
    keep a row with n_tokens=0 and score = σ(bias).

    Output: (id, n_tokens, logit, score).
    """
    from betl_spark.operators.sampling import hash_bucket

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    )
    # weights quantize to 9dp nano-units so the per-doc mean is an
    # order-free BIGINT sum (see dsir_scores determinism note)
    per_doc = (
        toks.select(id_col, hash_bucket("__tok", buckets).alias("bucket"))
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.round(F.coalesce("w", F.lit(0.0)) * F.lit(1e9)).cast("long")
                )
                / (F.count(F.lit(1)) * F.lit(1e9)),
                9,
            ).alias("__m"),
        )
    )
    logit = F.coalesce("__m", F.lit(0.0)) + F.lit(float(bias))
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.round(logit, 9).alias("logit"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(logit, 9))), 6).alias(
                "score"
            ),
        )
    )
