"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (word-level n-gram overlap, the
GPT-3/PaLM decontamination recipe): any training doc containing an
n-gram that also appears in a held-out benchmark is flagged, with its
overlap fraction, so the curation pipeline can drop or audit it.

Scale shape:
- n-gram construction is per-row column work (split → slice/join over
  the token array) — zero shuffle. The windowed alternative
  (posexplode + lead(n)) is full codegen but shuffles every TOKEN on
  the doc key; at corpus scale the interpreted-HOF cost per row is
  orders of magnitude below that exchange, so the HOF wins.
- the benchmark side is tiny by definition (eval sets are thousands of
  docs, not billions) → its distinct n-gram hashes BROADCAST; the
  corpus-side join is map-side, no corpus shuffle for matching.
- only (doc_id, ngram_hash) pairs ever move — 16 bytes/gram, never the
  text — and the per-doc rollup is a map-side-combinable count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from betl_spark.operators.util import ensure_parallelism


def word_ngrams(text_col: str, n: int) -> F.Column:
    """Distinct word n-grams of a space-tokenized text column (array of
    'w1 w2 ... wn' strings; empty when the doc has fewer than n
    tokens — the guard keeps sequence() from throwing on short docs).

    PERF: prefer tokenizing into a real column once and calling
    :func:`word_ngrams_col` — here ``split(text)`` sits INSIDE the
    per-position lambda (``slice`` re-evaluates its argument per
    element in interpreted higher-order functions), making this form
    O(len²) per document. Kept for API compatibility and small scopes.
    """
    toks = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN array_distinct(transform("
        f"sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' '))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def word_ngrams_col(toks_col: str, n: int) -> F.Column:
    """:func:`word_ngrams` over an ALREADY-TOKENIZED array column.

    The column reference is what makes the lambda linear: ``slice``
    over an attribute costs O(n) per position, while the text-column
    form re-runs ``split`` per position (measured O(len²): the
    contamination gram pass dropped 2.7s -> 0.4s at sf0.1). The
    consuming projection must keep the token array as a real column;
    CollapseProject will not inline it back because the expression
    references it 3x and split is not cheap-to-duplicate.
    """
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {n} THEN array_distinct(transform("
        f"sequence(0, size({toks_col}) - {n}), "
        f"i -> array_join(slice({toks_col}, i + 1, {n}), ' '))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Contaminated-doc report: (id, n_hits, n_ngrams,
    contamination_frac) for every corpus doc sharing ≥1 distinct word
    n-gram with the benchmark set; frac rounded to 6dp.

    Joins on xxhash64 of the n-gram (8-byte keys instead of strings);
    a hash collision could at worst over-flag one doc — acceptable for
    a flagging report, and the benchmark side is small enough that
    collisions are ~2^-64 · |grams|² improbable.
    """
    # n-gram construction is the CPU-heavy map work: don't let a single
    # small input split serialize it on one core (no-op at scale)
    corpus = ensure_parallelism(corpus)
    benchmark = ensure_parallelism(benchmark)
    # tokenize ONCE into a real column, then build grams from it
    # (word_ngrams_col docstring: the text-column form re-splits per
    # position inside the lambda — O(len²) per doc); the gram ARRAY is
    # likewise projected once so size() and explode() share one build
    bench_hashes = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__tk"))
        .select(F.explode(word_ngrams_col("__tk", n)).alias("gram"))
        .select(F.xxhash64("gram").alias("gram_hash"))
        .distinct()
    )
    doc_grams = (
        corpus.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__tk"))
        .select(F.col(id_col), word_ngrams_col("__tk", n).alias("grams"))
        .select(
            F.col(id_col),
            F.size("grams").alias("n_ngrams"),
            F.explode("grams").alias("gram"),
        )
    )
    hits = (
        doc_grams.select(id_col, "n_ngrams", F.xxhash64("gram").alias("gram_hash"))
        .join(F.broadcast(bench_hashes), "gram_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.first("n_ngrams").alias("n_ngrams"),
        )
    )
    return hits.select(
        id_col,
        "n_hits",
        "n_ngrams",
        F.round(
            F.col("n_hits").cast("double") / F.col("n_ngrams").cast("double"), 6
        ).alias("contamination_frac"),
    )


def remove_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_contamination: float = 0.0,
) -> DataFrame:
    """Decontaminated corpus: drop every document whose benchmark
    n-gram contamination fraction exceeds ``max_contamination``
    (default 0.0 = any overlap drops the doc, the strict GPT-3-style
    policy). The flagging report (``ngram_contamination``) drives a
    broadcast-able anti join — flagged ids are a tiny fraction of the
    corpus by construction, so the corpus itself never shuffles.
    """
    # filter on the UNROUNDED fraction: contamination_frac is rounded
    # to 6dp for the report, and a very long doc (>2M distinct grams)
    # with one hit rounds to 0.0 — under the strict default that doc
    # must still drop. n_hits/n_ngrams is exact here.
    flagged = ngram_contamination(corpus, benchmark, id_col, text_col, n).filter(
        F.col("n_hits").cast("double") / F.col("n_ngrams").cast("double")
        > F.lit(max_contamination)
    )
    return corpus.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )
