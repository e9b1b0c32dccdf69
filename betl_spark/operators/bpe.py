"""Tokenizer-faithful BPE token counting.

``token_count`` (operators/text.py) is a whitespace/regex heuristic;
training-data mixtures specified in real tokens need an actual
byte-pair-encoding vocabulary. This module implements classic BPE
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public algorithm) twice:

- ``train_merges``: the reference trainer, pure Python, deterministic
  (ties broken lexicographically), run once at import over an embedded
  seed text to produce ``DEFAULT_MERGES`` (a GPT-2-style ordered merge
  list — swap in real trained merges for production).
- ``bpe_token_count``: APPLICATION of a merge list to a text column as
  a single Catalyst expression — no UDF, no Python in the hot path.

The application encoding is the whole trick. Each symbol is wrapped in
U+001F sentinels (``\\x1f sym \\x1f``) and words are separated by
U+001E, so one merge rule (x, y) -> xy is one literal
``replace(s, '\\x1fx\\x1f\\x1fy\\x1f', '\\x1fxy\\x1f')``:

- both symbols are fully delimited, so a rule can never match a prefix
  or suffix of a longer symbol ('a'+'b' never fires inside 'ab c');
- consecutive matches do NOT share characters (each symbol carries its
  own sentinels), so Java/DuckDB leftmost non-overlapping replace
  consumes runs exactly like the BPE left-to-right scan: 'aaaa' with
  rule (a,a) -> [aa, aa], not [aa, a, a];
- word boundaries (\\x1e) break sentinel adjacency, so merges never
  cross words — the GPT-2 pre-tokenizer contract.

Applying rules exhaustively IN TRAINING ORDER is equivalent to the
min-rank-pair loop: a merge only creates new symbols, never new
adjacency between pre-existing symbols, so an earlier rule can never
become applicable after a later one fires.

The token count is then (len(s) - len(strip sentinels)) / 2 — one
codegen arithmetic, no split/explode. Scale shape: a map-only
projection (|merges| sequential string passes per row), zero shuffle,
pushdown-safe; the merge list ships in the plan, not as data.

The same merge list drives the DuckDB oracle (contract/round6.py
generates the mirrored SQL), which is what makes the count
"tokenizer-faithful": both engines replay the identical vocabulary.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

SYM = "\x1f"  # symbol sentinel (unit separator)
BND = "\x1e"  # word boundary (record separator)

# Original seed text (written for this repo): common English words with
# enough repetition for stable merges. Deterministic stand-in for a
# real trained vocabulary, same role as the md5-derived hyperplanes in
# operators/similarity.py.
SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while the other dogs "
    "watch the fox and the dog run through the long grass in the light "
    "of the morning sun the water in the river runs past the town and "
    "the people of the town walk along the water every morning talking "
    "about the weather and the work of the day some of the people stop "
    "to watch the running water and the light on the river then return "
    "to their work in the town where the day goes on and on the longer "
    "the morning the better the light the runners run past the walkers "
    "walking and talking the talkers talk about running and walking"
)


def train_merges(text: str, n_merges: int = 60) -> list[tuple[str, str]]:
    """Classic BPE training: start from characters, repeatedly merge
    the most frequent adjacent symbol pair (ties broken by the
    lexicographically greatest pair — any fixed rule works, it just
    must be deterministic). Returns the ordered merge list."""
    words: Counter = Counter()
    for w in text.split():
        words[tuple(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        merged: Counter = Counter()
        x, y = best
        for word, freq in words.items():
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == x and word[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            merged[tuple(out)] += freq
        words = merged
    return merges


DEFAULT_MERGES: list[tuple[str, str]] = train_merges(SEED_TEXT, 60)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_encoded(text_col: str, merges: list[tuple[str, str]] | None = None) -> F.Column:
    """The sentinel-encoded symbol string after all merges — exposed
    for debugging/tests; ``bpe_token_count`` is the production column.
    ``text_col`` is a column NAME (the expression is built as one SQL
    string, same pattern as similarity.hyperplane_signs)."""
    return F.expr(_encoded_expr(text_col, merges))


def _encoded_expr(text_col: str, merges: list[tuple[str, str]] | None) -> str:
    if merges is None:
        merges = DEFAULT_MERGES
    # 1. drop sentinel chars from the data, 2. GPT-2-style pre-token
    #    boundaries (punctuation/number runs split off), 3. every
    #    boundary char -> \x1e, 4. wrap each remaining char in \x1f
    s = f"coalesce({text_col}, '')"
    s = f"replace(replace({s}, {_sql_quote(SYM)}, ''), {_sql_quote(BND)}, '')"
    s = f"regexp_replace({s}, '([^ \\\\w]|\\\\d+)', ' $1 ')"
    s = f"regexp_replace({s}, ' +', {_sql_quote(BND)})"
    s = f"regexp_replace({s}, '([^{BND}])', {_sql_quote(SYM + '$1' + SYM)})"
    for x, y in merges:
        s = (
            f"replace({s}, {_sql_quote(SYM + x + SYM + SYM + y + SYM)}, "
            f"{_sql_quote(SYM + x + y + SYM)})"
        )
    return s


def train_merges_distributed(
    df,
    text_col: str,
    n_merges: int = 8,
):
    """Learn the top-``n_merges`` BPE merges FROM the corpus — the
    distributed counterpart of ``train_merges`` (same algorithm, same
    deterministic tiebreak: highest weighted pair count, then the
    lexicographically greatest pair), using the same sentinel encoding
    and GPT-2-style pre-tokenizer as the application path, so the
    learned list drops straight into ``bpe_token_count``.

    The scale trick is the one Sennrich's reference implementation
    uses: the corpus is scanned ONCE to build the word-frequency table
    (groupBy on the sentinel-encoded pre-token — map-side combinable,
    the exchange carries |distinct words|, not |tokens|), and every
    merge round then iterates over that bounded table: explode
    adjacent symbol pairs weighted by word frequency, aggregate, take
    the argmax (a 1-row bounded collect), apply the merge as ONE
    literal replace, lazily checkpoint. A 100 TB corpus pays one scan
    total; the K rounds cost O(|vocab words|) each.

    Returns a DataFrame (merge_rank, x, y, pair_count) — built from
    the K collected winners, so it is deterministic and trivially
    comparable across engines. Rounds stop early only if NO adjacent
    pair remains anywhere (degenerate corpora); there is deliberately
    no min-count cutoff so an independent engine can replay exactly K
    rounds.
    """
    spark = df.sparkSession
    base = F.expr(_encoded_expr(text_col, []))
    words = (
        df.select(F.explode(F.split(base, BND)).alias("enc"))
        .filter(F.col("enc") != "")
        .groupBy("enc")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms = F.split(
            F.regexp_replace(F.col("enc"), f"^{SYM}|{SYM}$", ""), SYM + SYM
        )
        pairs = (
            words.select(
                F.posexplode(F.slice(syms, 1, F.size(syms) - 1)).alias(
                    "i", "x"
                ),
                syms.alias("__syms"),
                "freq",
            )
            .select(
                "x",
                F.element_at(F.col("__syms"), F.col("i") + 2).alias("y"),
                "freq",
            )
            .groupBy("x", "y")
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(
            F.desc("c"), F.desc("x"), F.desc("y")
        ).limit(1).collect()
        if not best:
            break
        x, y, c = best[0]["x"], best[0]["y"], int(best[0]["c"])
        merges.append((x, y, c))
        words = words.select(
            F.expr(
                f"replace(enc, {_sql_quote(SYM + x + SYM + SYM + y + SYM)}, "
                f"{_sql_quote(SYM + x + y + SYM)})"
            ).alias("enc"),
            "freq",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        [(i + 1, x, y, c) for i, (x, y, c) in enumerate(merges)],
        "merge_rank int, x string, y string, pair_count long",
    )


def bpe_token_count(
    text_col: str, merges: list[tuple[str, str]] | None = None
) -> F.Column:
    """Exact BPE token count under ``merges`` (default
    ``DEFAULT_MERGES``) as a single codegen expression: each symbol
    carries exactly two \\x1f sentinels, so the count is
    (len(encoded) - len(encoded minus sentinels)) / 2."""
    enc = _encoded_expr(text_col, merges)
    return F.expr(
        f"CAST((length({enc}) - length(replace({enc}, {_sql_quote(SYM)}, ''))) / 2 "
        "AS INT)"
    )
