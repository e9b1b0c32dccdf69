"""Text-analysis operators for corpus pipelines.

All pure column expressions (whole-stage codegen, no UDFs): these run at
scan speed and their predicates/projections push into the parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# compact stopword profiles for the n-gram/stopword language heuristic;
# deliberately small + deterministic (the point is the operator shape,
# not lexicon quality)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens(text_col: str) -> F.Column:
    """Whitespace tokenization (single-space convention)."""
    return F.split(F.col(text_col), " ")


def bpe_ish_tokens(text_col: str) -> F.Column:
    """A BPE-ish regex tokenization: word pieces, numbers, punctuation
    as separate tokens (GPT-2-style pre-tokenizer shape)."""
    return F.expr(
        rf"filter(split(regexp_replace({text_col}, '([^ \\w]|\\d+)', ' $1 '), ' +'), t -> t != '')"
    )


def token_count(text_col: str) -> F.Column:
    return F.size(tokens(text_col))


def _stopword_count(text_col: str, words: list[str]) -> F.Column:
    """Occurrences of any listed stopword as a space-delimited token.

    One codegen ``regexp_count`` over the space-padded text with
    zero-width lookarounds — exactly the count of split(text, ' ')
    tokens that equal a listed word (matches are zero-consuming at the
    boundaries, so consecutive stopwords all count), but with no
    interpreted HOF lambda per token and no per-language array scan.
    NULL text → NULL, same as size(filter(split(NULL), ...)).
    """
    pat = "(?<= )(?:" + "|".join(words) + ")(?= )"
    return F.regexp_count(
        F.concat(F.lit(" "), F.col(text_col), F.lit(" ")), F.lit(pat)
    )


def text_quality(
    df: DataFrame, id_col: str, text_col: str, stop_lang: str = "en"
) -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation and
    stopword ratios — the standard cheap filters before expensive
    dedup/model scoring. Ratios are double divisions of exact ints
    (reproducible bit-for-bit on any engine)."""
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    n_toks = F.size(toks)
    n_stop = _stopword_count(text_col, LANG_STOPWORDS[stop_lang])
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(n_chars.cast("double") / n_toks.cast("double"), 6).alias("avg_token_len"),
        F.round(n_stop.cast("double") / n_toks.cast("double"), 6).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / n_chars.cast("double"), 6).alias("punct_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: count stopword hits per language
    profile; argmax wins, alphabetical-language tiebreak, 'und'
    (undetermined) when nothing matches. Output (id, lang_pred,
    lang_hits).

    Each profile's hit count is ONE codegen ``regexp_count`` pass (see
    ``_stopword_count``) — a pure projection: no HOF lambdas, no
    explode, no shuffle, so lang-ID composes into curation pipelines at
    scan speed. (The former formulation ran an interpreted
    filter-lambda per token per language — the slowest query in the
    round-1 bench at 7.5s/sf0.1; this shape runs in the text_quality
    ballpark.)"""
    # Each profile's regexp_count appears EXACTLY ONCE, inside one
    # array of (-hits, lang) structs; the argmax is array_sort + take
    # first (neg-hits asc = hits desc, then lang asc = alphabetical
    # tiebreak). The former per-when/greatest formulation referenced
    # every hit column ~5x — harmless as a standalone projection, but
    # when a downstream filter (e.g. lang_pred != 'und') is pushed
    # into the scan, Catalyst inlines the aliases and the predicate
    # re-evaluates each regexp ~25x per row (measured 34s -> 9s on the
    # curation pipeline at a 10x rehearsal decade). Keeping each
    # regexp single-referenced makes the operator safe to compose
    # under predicate pushdown.
    pairs = F.array(
        *[
            F.struct(
                (-_stopword_count(text_col, LANG_STOPWORDS[lang]))
                .cast("long")
                .alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.element_at(F.array_sort(pairs), 1)
    pred = F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        (-best["neg_hits"]).cast("long").alias("lang_hits"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 8, stride: int = 4
) -> DataFrame:
    """Document fingerprints: full-content md5 (exact identity) + the
    minimum sampled shingle hash (a 1-hash MinHash — winnowing-style
    content marker robust to reordering of large blocks). ``stride``
    samples every stride-th shingle position, cutting hash work by the
    stride factor at 100 TB with negligible marker-quality loss."""
    from betl_spark.operators.dedup import _md5_long, char_shingles

    min_shingle = F.array_min(
        F.transform(
            char_shingles(text_col, shingle_k, distinct=False, stride=stride),
            _md5_long,
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        min_shingle.alias("min_shingle_hash"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 3.0,
    max_avg_token_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, public spec):
    token-count bounds, mean-token-length bounds, symbol-to-token ratio
    ('#' and '...'), and a minimum stopword-hit count as a coherence
    proxy. Output (id, n_tokens, avg_token_len, symbol_ratio,
    stopword_hits, keep) — features are kept in the output so the
    filter is auditable, the standard shape for corpus curation where
    you must explain every dropped document.

    Pure column expressions (two regexp_counts + arithmetic): runs at
    scan speed, no shuffle, composes with the rest of the curation
    ladder in one stage."""
    toks = tokens(text_col)
    n_toks = F.size(toks)
    avg_len = F.round(F.length(text_col).cast("double") / n_toks.cast("double"), 6)
    n_symbols = F.regexp_count(F.col(text_col), F.lit("#")) + F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    )
    sym_ratio = F.round(n_symbols.cast("double") / n_toks.cast("double"), 6)
    stop_hits = _stopword_count(text_col, LANG_STOPWORDS["en"])
    keep = (
        (n_toks >= min_tokens)
        & (n_toks <= max_tokens)
        & (avg_len >= min_avg_token_len)
        & (avg_len <= max_avg_token_len)
        & (sym_ratio <= max_symbol_ratio)
        & (stop_hits >= min_stopword_hits)
    )
    return df.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        sym_ratio.alias("symbol_ratio"),
        stop_hits.alias("stopword_hits"),
        keep.alias("keep"),
    )


# PII patterns in the RE2 ∩ Java-regex dialect (portable to the oracle)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text_col: str, kind: str) -> F.Column:
    """How many occurrences of one PII pattern a document contains."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[kind]), F.lit(0)))


def pii_redact(text_col: str) -> F.Column:
    """Replace every PII occurrence with a typed placeholder token.

    Chained regexp_replace — stays inside whole-stage codegen; order
    matters (emails before IPs so 'user@1.2.3.4' redacts as one email).
    A corpus-scale scrub is this expression at scan speed: no shuffle,
    no UDF, predicate/column pruning unaffected.
    """
    out = F.col(text_col)
    for kind in ("email", "phone", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``overlap`` characters of context shared between neighbors — the
    standard pre-tokenization windowing for context-bounded training
    and for RAG-style passage indexing.

    Chunk i covers [i·stride, i·stride + size) with stride = size −
    overlap; the chunk count is ceil((len − overlap) / stride) (min 1,
    so empty/NULL text yields one empty chunk and no document silently
    vanishes — the ``line_dedup`` NULL rule).

    Scale shape: sequence + explode + substring is pure map-side
    column work — no shuffle, no UDF, stays inside whole-stage
    codegen; output row count is Σ ceil(len/stride), linear in corpus
    bytes. DuckDB replays it with range() + substr (both engines'
    substring is 1-based and clamps past the end).
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(txt) - F.lit(overlap)).cast("double") / F.lit(float(stride))),
    ).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n - F.lit(1))).alias("chunk_idx"),
        txt.alias("__t"),
    ).select(
        id_col,
        "chunk_idx",
        F.substring(F.col("__t"), F.col("chunk_idx") * stride + 1, size).alias(
            "chunk_text"
        ),
    )


def char_diversity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top_char_ratio: float = 0.2,
    max_concentration: float = 0.1,
) -> DataFrame:
    """Character-distribution quality signals per document: distinct
    character count, top-character frequency ratio, and Simpson
    concentration Σ(cᵢ/n)² — the inverse-participation diversity index.
    Low-diversity text (one char dominating, concentration near 1) is
    the classic garbage signature: padding runs, base64 walls, ASCII
    art, broken encodings. Simpson concentration carries the same
    signal as character entropy but is a RATIO OF EXACT INTEGERS
    (Σc²/n²), so the cross-engine contract never touches a
    transcendental (log2's last ulp differs across libm
    implementations; the ppl operator pays a 9dp-rounding tax for it —
    corpus.py lm_score).

    One explode→count per (doc, char) with map-side combine, then a
    per-doc re-aggregate: two shuffles keyed on doc id, each group
    bounded by the alphabet (≤ a few hundred rows), so reducers never
    see more than |alphabet| rows per doc no matter the corpus size.

    Output: (id, n_chars_counted, distinct_chars, top_char_ratio,
    simpson_concentration, keep) — ratios 6dp; ``keep`` applies the
    thresholds (strictly-below convention, engine-exact on the rounded
    values).
    """
    counts = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), ""), lambda c: c != F.lit("")
                )
            ).alias("__c"),
        )
        .groupBy(id_col, "__c")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__n").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.max("__n").alias("__top"),
        F.sum(F.col("__n") * F.col("__n")).alias("__s2"),
    )
    n_d = F.col("n_chars_counted").cast("double")
    top_ratio = F.round(F.col("__top").cast("double") / n_d, 6)
    conc = F.round(F.col("__s2").cast("double") / (n_d * n_d), 6)
    return per_doc.select(
        id_col,
        "n_chars_counted",
        "distinct_chars",
        top_ratio.alias("top_char_ratio"),
        conc.alias("simpson_concentration"),
        (
            (top_ratio < F.lit(float(max_top_char_ratio)))
            & (conc < F.lit(float(max_concentration)))
        ).alias("keep"),
    )


def readability(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Flesch-reading-ease-style readability scoring per document —
    the quality-filter feature that separates natural prose from
    keyword-stuffed or machine-generated filler by sentence and word
    shape alone (no model, no dictionary).

    All three inputs are exact integer counts from one codegen'd
    projection (no shuffle at all): words = non-empty
    single-space-delimited tokens (the contract's tokenization
    convention — tabs/newlines are NOT token boundaries, matching the
    oracle's split on ' '); sentences = runs of [.!?] (floored at 1 — a fragment is
    one sentence); syllables ~= vowel-group runs per lowercased text
    (the standard dictionary-free estimator). The score
    206.835 − 1.015·(W/S) − 84.6·(Syl/W) is one engine-identical IEEE
    expression, NULL for wordless docs.

    Output: (id, n_words, n_sentences, n_syllables, flesch 4dp).
    """
    toks = F.expr(
        f"size(filter(split({text_col}, ' '), t -> t != ''))"
    ).cast("long")
    sents = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"size(regexp_extract_all({text_col}, '[.!?]+', 0))").cast(
            "long"
        ),
    )
    syls = F.expr(
        f"size(regexp_extract_all(lower({text_col}), '[aeiouy]+', 0))"
    ).cast("long")
    base = df.select(
        F.col(id_col),
        toks.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
    )
    from betl_spark.operators.util import round_ratio_expr

    # the score as ONE exact integer ratio (denominators W, S are
    # small — the demonstrated cross-engine round() midpoint hazard):
    # flesch = N/D with N = 206835·S·W − 1015·W² − 84600·S·Syl and
    # D = 1000·S·W (coefficients ×1000 clears the decimal literals).
    # BIGINT headroom: 2·|N|·10⁴ stays under 2⁶³ through ~3·10⁴-token
    # documents — chunk longer docs upstream.
    num = (
        "206835 * n_sentences * n_words "
        "- 1015 * n_words * n_words "
        "- 84600 * n_sentences * n_syllables"
    )
    den = "1000 * n_sentences * n_words"
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            round_ratio_expr(num, den, 4),
        ).alias("flesch"),
    )
