"""Round-5 contract queries: target-mixture corpus rebalancing.

Same determinism rules as the rest of the contract. The mixture
thresholds are floor-quantized to the hash-bucket grid in BOTH engines
(IEEE-double FLOOR is engine-exact; round-half at .5 is not), so the
kept row set is bit-identical.
"""

from __future__ import annotations

from betl_spark.contract.common import table
from betl_spark.contract.scale import (
    BANDS,
    MINHASH_SIG_CTE,
    MUTANT_OFFSET,
    N_HASHES,
    SHINGLE_K,
    _augmented_docs,
)

# target language mix for the rebalanced corpus: en-heavy with fixed
# minority shares — zh is the limiting stratum in the testdata (scarcest
# relative to its 0.2 target), so it keeps 100% and everything else
# downsamples proportionally
MIX_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.15, "es": 0.1, "fr": 0.05}


def q_mixture_rebalance(spark, sf_dir):
    from betl_spark.operators import sampling

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.mixture_sample(docs, "doc_id", "lang", MIX_WEIGHTS)


_W_VALUES = ", ".join(f"('{s}', CAST({w} AS DOUBLE))" for s, w in MIX_WEIGHTS.items())

# replays mixture_rates + the hash filter: same division order
# (MIN(n/w); (limit*w)/n), same FLOOR quantization, same md5 bucket
MIXTURE_REBALANCE_SQL = f"""
WITH counts AS (
  SELECT lang AS s, COUNT(*) AS n FROM documents GROUP BY 1
), w(s, wt) AS (VALUES {_W_VALUES}),
lim AS (
  SELECT MIN(c.n / w.wt) AS c FROM counts c JOIN w ON c.s = w.s
),
th AS (
  SELECT c.s,
         CAST(FLOOR(LEAST(1.0, lim.c * w.wt / c.n) * 10000) AS BIGINT) AS th
  FROM counts c JOIN w ON c.s = w.s CROSS JOIN lim
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th ON d.lang = th.s
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
      < th.th
"""


def q_mixture_rebalance_tokens(spark, sf_dir):
    """Token-weighted mixture: same target weights, but strata sized by
    total characters (n_chars as the token proxy) instead of doc count
    — the way real training mixes are specified."""
    from betl_spark.operators import sampling

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.mixture_sample(
        docs, "doc_id", "lang", MIX_WEIGHTS, weight_col="n_chars"
    ).select("doc_id", "lang")


MIXTURE_REBALANCE_TOKENS_SQL = f"""
WITH counts AS (
  SELECT lang AS s, CAST(SUM(n_chars) AS BIGINT) AS n FROM documents GROUP BY 1
), w(s, wt) AS (VALUES {_W_VALUES}),
lim AS (
  SELECT MIN(c.n / w.wt) AS c FROM counts c JOIN w ON c.s = w.s
),
th AS (
  SELECT c.s,
         CAST(FLOOR(LEAST(1.0, lim.c * w.wt / c.n) * 10000) AS BIGINT) AS th
  FROM counts c JOIN w ON c.s = w.s CROSS JOIN lim
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th ON d.lang = th.s
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
      < th.th
"""


def q_quantile_band_filter(spark, sf_dir):
    """Per-language IQR trim of document lengths (quantile_filter with
    binary-exact 0.25/0.75 bounds — bit-identical interpolation across
    engines)."""
    from betl_spark.operators.stats import quantile_filter

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return quantile_filter(docs, "n_chars", 0.25, 0.75, group_cols=["lang"])


QUANTILE_BAND_FILTER_SQL = """
WITH b AS (
  SELECT lang,
         quantile_cont(n_chars, 0.25) AS lo,
         quantile_cont(n_chars, 0.75) AS hi
  FROM documents GROUP BY 1
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN b USING (lang)
WHERE CAST(d.n_chars AS DOUBLE) >= b.lo AND CAST(d.n_chars AS DOUBLE) <= b.hi
"""


def q_shard_stats(spark, sf_dir):
    """Shard-balance report for the training-shard export: per-shard doc
    count and char volume under the deterministic md5 bucketing."""
    from pyspark.sql import functions as F

    from betl_spark.operators.sampling import shard_assign

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        shard_assign(docs, "doc_id", 16)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SHARD_STATS_SQL = """
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16
         AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: the mutant batch (id >= MUTANT_OFFSET)
    checked against the original corpus only — no corpus×corpus
    re-pairing. Same params as the batch LSH family."""
    from pyspark.sql import functions as F

    from betl_spark.operators import dedup

    aug = _augmented_docs(spark, sf_dir)
    new_batch = aug.filter(F.col("doc_id") >= MUTANT_OFFSET)
    ref_corpus = aug.filter(F.col("doc_id") < MUTANT_OFFSET)
    return dedup.near_dups_against(
        new_batch,
        ref_corpus,
        "doc_id",
        "text",
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        threshold=0.5,
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH {MINHASH_SIG_CTE},
banded AS (
  SELECT doc_id, CAST(h_idx // {N_HASHES // BANDS} AS INTEGER) AS band,
         md5(string_agg(CAST(h_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), ','
             ORDER BY CAST(h_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))) AS band_hash
  FROM sigs GROUP BY doc_id, CAST(h_idx // {N_HASHES // BANDS} AS INTEGER)
),
cand AS (
  SELECT DISTINCT n.doc_id AS id_new, r.doc_id AS id_ref
  FROM banded n JOIN banded r ON n.band = r.band AND n.band_hash = r.band_hash
  WHERE n.doc_id >= {MUTANT_OFFSET} AND r.doc_id < {MUTANT_OFFSET}
),
shg AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, length(text) - {SHINGLE_K - 1}),
           i -> substr(text, CAST(i AS INTEGER) + 1, {SHINGLE_K}))) AS sh
  FROM aug
)
SELECT id_new, id_ref, jaccard FROM (
  SELECT c.id_new, c.id_ref,
         -- integral 6dp rounding (non-dyadic count-ratio midpoints)
         CAST(CASE WHEN (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0 THEN (2 * (len(list_intersect(a.sh, b.sh))) * 1000000 + (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) // (2 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) END AS DOUBLE) / 1000000.0 AS jaccard
  FROM cand c JOIN shg a ON a.doc_id = c.id_new
  JOIN shg b ON b.doc_id = c.id_ref
) WHERE jaccard >= 0.5
"""


def q_line_dedup(spark, sf_dir):
    """Line-level boilerplate removal: every doc gets a shared header +
    footer line around its (unique) original text; corpus-wide line
    dedup must strip exactly those two lines from every document."""
    from pyspark.sql import functions as F

    from betl_spark.operators import dedup

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("SITE NAV HOME ABOUT\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nCOPYRIGHT 2024 ALL RIGHTS RESERVED"),
        ).alias("text"),
    )
    return dedup.line_dedup(docs, "doc_id", "text", min_docs=2)


LINE_DEDUP_SQL = """
WITH aug AS (
  SELECT doc_id,
         'SITE NAV HOME ABOUT' || chr(10) || coalesce(text, '') || chr(10) ||
         'COPYRIGHT 2024 ALL RIGHTS RESERVED' AS text
  FROM documents
),
sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
l AS (
  SELECT doc_id, UNNEST(ls) AS line, UNNEST(range(1, len(ls) + 1)) AS pos
  FROM sp
),
counts AS (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM l GROUP BY 1),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM l JOIN counts USING (line)
  WHERE counts.nd < 2
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, len(ls) AS n FROM sp)
SELECT t.doc_id,
       COALESCE(r.text, '') AS text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(t.n - COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_dropped
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


def q_decontaminate_remove(spark, sf_dir):
    """End-to-end decontamination: the corpus with every doc sharing a
    word 4-gram with the src0 benchmark removed (strict policy)."""
    from pyspark.sql import functions as F

    from betl_spark.operators.decontam import remove_contaminated

    docs = table(spark, sf_dir, "documents")
    out = remove_contaminated(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=4,
    )
    return out.select("doc_id", "source", "lang")


DECONTAMINATE_REMOVE_SQL = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), bench AS (
  SELECT DISTINCT unnest(list_transform(
           range(0, len(tk) - 3),
           i -> array_to_string(list_slice(tk, i + 1, i + 4), ' '))) AS g
  FROM toks WHERE source = 'src0' AND len(tk) >= 4
), flagged AS (
  SELECT DISTINCT c.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(list_transform(
             range(0, len(tk) - 3),
             i -> array_to_string(list_slice(tk, i + 1, i + 4), ' ')))) AS g
    FROM toks WHERE source <> 'src0' AND len(tk) >= 4
  ) c JOIN bench b ON c.g = b.g
)
SELECT d.doc_id, d.source, d.lang
FROM documents d
WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
"""


QUERIES = {
    "mixture_rebalance": (q_mixture_rebalance, MIXTURE_REBALANCE_SQL),
    "mixture_rebalance_tokens": (
        q_mixture_rebalance_tokens,
        MIXTURE_REBALANCE_TOKENS_SQL,
    ),
    "quantile_band_filter": (q_quantile_band_filter, QUANTILE_BAND_FILTER_SQL),
    "shard_stats": (q_shard_stats, SHARD_STATS_SQL),
    "dedup_incremental": (q_dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "line_dedup": (q_line_dedup, LINE_DEDUP_SQL),
    "decontaminate_remove": (q_decontaminate_remove, DECONTAMINATE_REMOVE_SQL),
}
