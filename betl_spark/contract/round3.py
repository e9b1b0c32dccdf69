"""Round-3 contract queries: batch sessionization, benchmark
decontamination, distribution quantiles, vocabulary coverage, and
shingle containment — the curation-adjacent operators a training-data
pipeline runs between ingestion and packing.

Same determinism rules as the rest of the contract (decimal-exact money
sums, 6dp rounds on float outputs, total orders on any LIMIT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table
from betl_spark.contract.scale import (
    AUGMENTED_DOCS_SQL,
    BANDS,
    MINHASH_SIG_CTE,
    N_HASHES,
    SHINGLE_K,
    _augmented_docs,
)
from betl_spark.operators import dedup
from betl_spark.operators.corpus import vocab_coverage
from betl_spark.operators.decontam import ngram_contamination
from betl_spark.operators.sessions import session_stats
from betl_spark.operators.stats import grouped_quantiles

SESSION_GAP_S = 1800
DECONTAM_N = 4


# ---- batch sessionization (gap-based, per-user) ----
def q_sessionize_events(spark, sf_dir):
    return session_stats(
        table(spark, sf_dir, "events"),
        "user_id",
        "ts",
        gap_seconds=SESSION_GAP_S,
        value_col="value",
    )


SESSIONIZE_EVENTS_SQL = f"""
WITH ordered AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, ts, value
  FROM events WHERE ts IS NOT NULL
), flagged AS (
  SELECT user_id, ts_s, value,
         CASE WHEN lag(ts_s) OVER w IS NULL
                OR ts_s - lag(ts_s) OVER w > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), seq AS (
  SELECT user_id, ts_s, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts_s) AS session_start,
       MAX(ts_s) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM seq
GROUP BY user_id, session_seq
"""


# ---- benchmark n-gram decontamination ----
def q_decontaminate_docs(spark, sf_dir):
    """Benchmark = src0 documents; corpus = everything else. Flags
    corpus docs sharing any distinct word 4-gram with the benchmark."""
    docs = table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=DECONTAM_N,
    )


DECONTAMINATE_DOCS_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), bench AS (
  SELECT DISTINCT unnest(list_transform(
           range(0, len(tk) - {DECONTAM_N - 1}),
           i -> array_to_string(list_slice(tk, i + 1, i + {DECONTAM_N}), ' '))) AS g
  FROM toks WHERE source = 'src0' AND len(tk) >= {DECONTAM_N}
), corp AS (
  SELECT doc_id,
         len(list_distinct(list_transform(
           range(0, len(tk) - {DECONTAM_N - 1}),
           i -> array_to_string(list_slice(tk, i + 1, i + {DECONTAM_N}), ' ')))) AS n_ngrams,
         unnest(list_distinct(list_transform(
           range(0, len(tk) - {DECONTAM_N - 1}),
           i -> array_to_string(list_slice(tk, i + 1, i + {DECONTAM_N}), ' ')))) AS g
  FROM toks WHERE source <> 'src0' AND len(tk) >= {DECONTAM_N}
)
SELECT c.doc_id, COUNT(*) AS n_hits, FIRST(c.n_ngrams) AS n_ngrams,
       ROUND(CAST(COUNT(*) AS DOUBLE) / FIRST(c.n_ngrams), 6) AS contamination_frac
FROM corp c JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
"""


# ---- exact grouped quantiles (doc-length distribution per language) ----
def q_doc_length_quantiles(spark, sf_dir):
    return grouped_quantiles(
        table(spark, sf_dir, "documents"), ["lang"], "n_chars"
    )


DOC_LENGTH_QUANTILES_SQL = """
SELECT lang,
       ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
       ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
       ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
       ROUND(quantile_cont(n_chars, 0.95), 6) AS p95
FROM documents GROUP BY lang
"""


# ---- vocabulary coverage curve ----
COVERAGE_THRESHOLDS = (0.5, 0.75, 0.9)
COVERAGE_MAX_VOCAB = 10000


def q_vocab_coverage(spark, sf_dir):
    return vocab_coverage(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        thresholds=COVERAGE_THRESHOLDS,
        max_vocab=COVERAGE_MAX_VOCAB,
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n FROM toks GROUP BY token
), top AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS r,
         SUM(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
  QUALIFY r <= {COVERAGE_MAX_VOCAB}
), total AS (
  SELECT SUM(n) AS grand FROM counts
)
SELECT th.v AS coverage_threshold, MIN(top.r) AS tokens_needed
FROM top
CROSS JOIN total
CROSS JOIN (VALUES {", ".join(f"({t})" for t in COVERAGE_THRESHOLDS)}) th(v)
WHERE CAST(top.cum AS DOUBLE) >= th.v * CAST(total.grand AS DOUBLE)
GROUP BY th.v
"""


# ---- shingle containment on LSH candidates ----
CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark, sf_dir):
    """Containment (|A∩B| / min set size) verified over LSH candidate
    pairs — the near-subset detector; the augmented corpus's truncated
    mutants are contained ~1.0 in their originals even where Jaccard
    dips with the truncation."""
    docs = _augmented_docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", N_HASHES, SHINGLE_K)
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BANDS)
    return dedup.ngram_containment_pairs(
        docs,
        "doc_id",
        "text",
        SHINGLE_K,
        threshold=CONTAINMENT_THRESHOLD,
        pairs=cand,
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH {MINHASH_SIG_CTE},
banded AS (
  SELECT doc_id, CAST(h_idx // {N_HASHES // BANDS} AS INTEGER) AS band,
         md5(string_agg(CAST(h_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), ','
             ORDER BY CAST(h_idx AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))) AS band_hash
  FROM sigs GROUP BY doc_id, CAST(h_idx // {N_HASHES // BANDS} AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
shs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, length(text) - {SHINGLE_K - 1}),
           i -> substr(text, CAST(i AS INTEGER) + 1, {SHINGLE_K}))) AS s
  FROM aug
)
SELECT id_a, id_b, containment FROM (
  SELECT c.id_a, c.id_b,
         -- integral 6dp rounding (non-dyadic count-ratio midpoints)
         CAST(CASE WHEN (LEAST(len(a.s), len(b.s))) > 0 THEN (2 * (len(list_intersect(a.s, b.s))) * 1000000 + (LEAST(len(a.s), len(b.s)))) // (2 * (LEAST(len(a.s), len(b.s)))) END AS DOUBLE) / 1000000.0 AS containment
  FROM cand c
  JOIN shs a ON a.doc_id = c.id_a
  JOIN shs b ON b.doc_id = c.id_b
) WHERE containment >= {CONTAINMENT_THRESHOLD}
"""


QUERIES = {
    "sessionize_events": (q_sessionize_events, SESSIONIZE_EVENTS_SQL),
    "decontaminate_docs": (q_decontaminate_docs, DECONTAMINATE_DOCS_SQL),
    "doc_length_quantiles": (q_doc_length_quantiles, DOC_LENGTH_QUANTILES_SQL),
    "vocab_coverage": (q_vocab_coverage, VOCAB_COVERAGE_SQL),
    "dedup_containment": (q_dedup_containment, DEDUP_CONTAINMENT_SQL),
}
