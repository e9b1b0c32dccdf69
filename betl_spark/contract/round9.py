"""Round-9 contract queries.

`ivf_topk_trained` closes the round-8 verdict's centroid gap: the IVF
family always probed SEED-ROW centroids ("a deterministic stand-in for
trained k-means centroids") even though the trainer (`centroid_update`,
green r8) existed — here `kmeans_train` runs N full spherical k-means
rounds and the index is probed THROUGH that trained model
(`ivf_topk_model` — the identical probe plan as `similarity_ann_ivf`,
only the centroid table differs). The DuckDB oracle replays training
round by round as chained CTEs: every round's centroid values are
round(avg, 6) short decimals, so both engines' next-round cosines see
identical inputs and the argmax/tiebreak (sim desc, cell_id asc) can
never diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table
from betl_spark.contract.scale import (
    EMB_DIM,
    IVF_CENTROID_IDS,
    _CELL_COS,
    _COSINE_PAIR,
)
from betl_spark.operators import similarity

KMEANS_ITERS = 2
TRAINED_NPROBE = 2


def q_ivf_topk_trained(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_train(
        emb, "vec_id", "embedding", IVF_CENTROID_IDS, iterations=KMEANS_ITERS
    )
    return similarity.ivf_topk_model(
        emb, "vec_id", "embedding", list(range(10)), cents,
        k=5, nprobe=TRAINED_NPROBE,
    )


def _kmeans_round_sql(prev_cent: str, rnd: int) -> str:
    """One k-means round as CTE text: assign (argmax over cosines vs
    ``prev_cent``), mean per (cell, pos) rounded to 6, re-assemble the
    wide centroid list — mirrors `kmeans_train`'s round exactly."""
    return f"""
assign{rnd} AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_CELL_COS} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN {prev_cent} c
),
m{rnd} AS (
  SELECT cell_id, CAST(r.range AS INTEGER) AS pos,
         round(avg(CAST(embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE)), 6) AS v
  FROM assign{rnd} CROSS JOIN range({EMB_DIM}) r
  WHERE cell_rank = 1
  GROUP BY 1, 2
),
cent{rnd} AS (
  SELECT cell_id, list(v ORDER BY pos) AS embedding
  FROM m{rnd} GROUP BY cell_id
)"""


_ROUNDS = ",".join(
    _kmeans_round_sql(f"cent{i - 1}" if i > 1 else "cent0", i)
    for i in range(1, KMEANS_ITERS + 1)
)

IVF_TOPK_TRAINED_SQL = f"""
WITH cent0 AS (
  SELECT vec_id AS cell_id, embedding FROM embeddings
  WHERE vec_id IN ({", ".join(str(i) for i in IVF_CENTROID_IDS)})
),
{_ROUNDS},
final_assign AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_CELL_COS} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN cent{KMEANS_ITERS} c
),
corpus AS (SELECT vec_id, embedding, cell_id FROM final_assign WHERE cell_rank = 1),
probes AS (
  SELECT vec_id, embedding, cell_id FROM final_assign
  WHERE vec_id < 10 AND cell_rank <= {TRAINED_NPROBE}
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COSINE_PAIR} AS cosine_sim
  FROM probes a JOIN corpus b ON a.cell_id = b.cell_id AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


QUERIES = {
    "ivf_topk_trained": (q_ivf_topk_trained, IVF_TOPK_TRAINED_SQL),
}


# =====================================================================
# Round-9 breadth: time-series continuous aggregates (gap-filled
# resample, rolling anomaly z-score, TWAP), robust profiling
# (winsorized moments, equi-depth histogram), record linkage (blocked
# fuzzy name matching), retrieval (conjunctive keyword search), corpus
# lineage (source n-gram overlap matrix), and character-distribution
# quality — each a distinct plan shape the engine had no contract row
# for, each 100 TB-safe per its operator docstring.
# =====================================================================

from betl_spark.contract.common import ts_micros
from betl_spark.operators import corpus as corpus_ops
from betl_spark.operators import linkage
from betl_spark.operators import stats as stats_ops
from betl_spark.operators import text as text_ops
from betl_spark.operators import timeseries


# ---- gap-filled daily resample per user ----
def q_resample_gapfill(spark, sf_dir):
    """Per-user daily continuous aggregate with gap rows and a
    forward-filled mean — the hypertable rollup shape."""
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    return timeseries.resample_gapfill(
        ev, "user_id", "__ts_us", "value", timeseries.MICROS_PER_DAY
    )


RESAMPLE_GAPFILL_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS b,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events WHERE ts IS NOT NULL
),
bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM e),
keys AS (SELECT DISTINCT user_id FROM e),
spine AS (
  SELECT k.user_id, u.b
  FROM keys k CROSS JOIN
       (SELECT unnest(generate_series(b0, b1)) AS b FROM bounds) u
),
agg AS (SELECT user_id, b, count(*) AS n, sum(v) AS sv FROM e GROUP BY 1, 2),
j AS (
  SELECT s.user_id, s.b AS bucket,
         coalesce(a.n, 0) AS n_events,
         coalesce(round(CAST(a.sv AS DOUBLE), 6), 0.0) AS sum_value,
         round(CAST(a.sv AS DOUBLE) / a.n, 6) AS av
  FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.b = a.b
),
g AS (
  SELECT *, count(av) OVER (PARTITION BY user_id ORDER BY bucket) AS grp
  FROM j
)
SELECT user_id, bucket, n_events, sum_value,
       max(av) OVER (PARTITION BY user_id, grp) AS ffill_avg
FROM g
"""

QUERIES["resample_gapfill_daily"] = (q_resample_gapfill, RESAMPLE_GAPFILL_SQL)


# ---- rolling z-score anomaly detection ----
ZSCORE_WINDOW = 100
ZSCORE_MIN = 20
ZSCORE_THRESH = 3.0


def q_rolling_zscore(spark, sf_dir):
    """Trailing-window anomaly scores per event_type: exact-decimal
    rolling Σv/Σv² (never a double stddev — sliding-frame summation
    order differs across engines), doubles only in the final IEEE
    ops. Banded strategy (r14): events has ~5 event types, so the
    per-key Window serializes onto 5 tasks at ANY scale; the banded
    prefix-sum decomposition is bit-identical (pinned in
    tests/test_round9_ops.py) and parallelizes to |keys|×bands. Band
    count scales with the cluster (4× defaultParallelism), not a
    local constant."""
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    return timeseries.rolling_zscore(
        ev, "event_type", "__ts_us", "event_id", "value",
        window_rows=ZSCORE_WINDOW, min_rows=ZSCORE_MIN, z_thresh=ZSCORE_THRESH,
        n_bands=4 * spark.sparkContext.defaultParallelism,
    )


ROLLING_ZSCORE_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t, event_id,
         CAST(value AS DECIMAL(12,3)) AS v,
         CAST(CAST(value AS DECIMAL(12,3)) * CAST(value AS DECIMAL(12,3))
              AS DECIMAL(20,6)) AS v2
  FROM events WHERE ts IS NOT NULL
),
w AS (
  SELECT event_type, event_id, v,
         count(v) OVER win AS n,
         sum(v)   OVER win AS s,
         sum(v2)  OVER win AS s2
  FROM e
  WINDOW win AS (PARTITION BY event_type ORDER BY t, event_id
                 ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING)
),
sc AS (
  SELECT event_type, event_id, CAST(v AS DOUBLE) AS value,
         CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                   / (n - 1) > 0.0
              THEN round((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / n)
                         / sqrt((CAST(s2 AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                / (n - 1)), 6) + 0.0
              END AS zscore
  FROM w WHERE n >= {ZSCORE_MIN}
)
SELECT event_type, event_id, value, zscore,
       abs(zscore) > {ZSCORE_THRESH} AS is_anomaly
FROM sc
"""

QUERIES["rolling_zscore_events"] = (q_rolling_zscore, ROLLING_ZSCORE_SQL)


# ---- time-weighted average per user ----
def q_time_weighted_avg(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    return timeseries.time_weighted_avg(ev, "user_id", "__ts_us", "value")


TIME_WEIGHTED_AVG_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, CAST(value AS DECIMAL(12,3)) AS v
  FROM events WHERE ts IS NOT NULL
),
g AS (
  SELECT user_id, v,
         (lead(t) OVER (PARTITION BY user_id ORDER BY t, v) - t) // 1000000
           AS dur_s
  FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dur_s) AS BIGINT) AS total_seconds,
       CASE WHEN sum(dur_s) > 0
            THEN round(CAST(sum(CAST(v * dur_s AS DECIMAL(28,3))) AS DOUBLE)
                       / CAST(sum(dur_s) AS DOUBLE), 6) END AS twap
FROM g WHERE dur_s IS NOT NULL
GROUP BY user_id
"""

QUERIES["time_weighted_avg_events"] = (q_time_weighted_avg, TIME_WEIGHTED_AVG_SQL)


# ---- winsorized per-group moments ----
def q_winsorized_stats(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return stats_ops.winsorized_stats(
        ev, ["event_type"], "value", p_lo=0.01, p_hi=0.99
    )


WINSORIZED_STATS_SQL = """
WITH p AS (
  SELECT event_type,
         round(quantile_cont(CAST(value AS DOUBLE), 0.01), 6) AS lo,
         round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(p.lo, 6) AS lo,
       round(p.hi, 6) AS hi,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) < p.lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) > p.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_hi,
       round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_raw,
       round(CAST(sum(CAST(least(greatest(CAST(e.value AS DOUBLE), p.lo), p.hi)
                          AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_winsor
FROM events e JOIN p USING (event_type)
GROUP BY e.event_type, p.lo, p.hi
"""

QUERIES["winsorized_event_stats"] = (q_winsorized_stats, WINSORIZED_STATS_SQL)


# ---- equi-depth histogram over doc lengths ----
def q_equidepth_histogram(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return stats_ops.equidepth_histogram(docs, "n_chars", "doc_id", n_buckets=10)


EQUIDEPTH_HISTOGRAM_SQL = """
WITH r AS (
  SELECT n_chars AS v,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rank,
         count(*) OVER () AS n_total
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT (rank - 1) * 10 // n_total AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(v) AS lo, max(v) AS hi
FROM r GROUP BY 1
"""

QUERIES["equidepth_histogram_chars"] = (q_equidepth_histogram, EQUIDEPTH_HISTOGRAM_SQL)


# ---- blocked fuzzy matching over part names ----
FUZZY_MAX_DIST = 3


def q_fuzzy_dedup_part_names(spark, sf_dir):
    """ER pipeline: canonicalize exact duplicates → block on the first
    token → JVM levenshtein inside blocks only (never a cross join)."""
    part = table(spark, sf_dir, "part")
    names = linkage.canonicalize_names(part, "p_partkey", "p_name")
    return linkage.fuzzy_join_blocked(
        names, linkage.first_token_block, max_dist=FUZZY_MAX_DIST
    )


FUZZY_DEDUP_PART_NAMES_SQL = f"""
WITH names AS (
  SELECT p_name AS name, min(p_partkey) AS canonical_id,
         count(*) AS n_members
  FROM part GROUP BY 1
),
s AS (
  SELECT split_part(name, ' ', 1) AS block, name, canonical_id, n_members
  FROM names
)
SELECT a.block,
       a.name AS name_a, b.name AS name_b,
       a.canonical_id AS id_a, b.canonical_id AS id_b,
       CAST(a.n_members AS BIGINT) AS n_members_a,
       CAST(b.n_members AS BIGINT) AS n_members_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM s a JOIN s b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
"""

QUERIES["fuzzy_dedup_part_names"] = (q_fuzzy_dedup_part_names, FUZZY_DEDUP_PART_NAMES_SQL)


# ---- conjunctive keyword search ----
SEARCH_TERMS = ["spark", "merge", "window"]


def q_keyword_search_and(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return corpus_ops.keyword_search_and(
        docs, "doc_id", "text", SEARCH_TERMS, top_n=20, keep_cols=["lang"]
    )


KEYWORD_SEARCH_AND_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT doc_id, lang, t, count(*) AS tf
  FROM toks WHERE t IN ({", ".join("'" + t + "'" for t in SEARCH_TERMS)})
  GROUP BY 1, 2, 3
)
SELECT doc_id, lang,
       CAST(count(DISTINCT t) AS BIGINT) AS n_terms_matched,
       CAST(sum(tf) AS BIGINT) AS score
FROM tf GROUP BY doc_id, lang
HAVING count(DISTINCT t) = {len(SEARCH_TERMS)}
ORDER BY score DESC, doc_id LIMIT 20
"""

QUERIES["keyword_search_and"] = (q_keyword_search_and, KEYWORD_SEARCH_AND_SQL)


# ---- source n-gram overlap matrix ----
OVERLAP_NGRAM = 8


def q_source_overlap_matrix(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return corpus_ops.source_overlap_matrix(
        docs, "source", "text", ngram=OVERLAP_NGRAM
    )


SOURCE_OVERLAP_MATRIX_SQL = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT source, w,
         unnest(range(1, greatest(len(w) - {OVERLAP_NGRAM - 2}, 1))) AS i
  FROM toks
),
grams AS (
  SELECT DISTINCT source AS g,
         md5(array_to_string(
           list_slice(w, CAST(i AS INTEGER),
                      CAST(i AS INTEGER) + {OVERLAP_NGRAM - 1}), ' ')) AS h
  FROM pos
),
sizes AS (SELECT g, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, count(*) AS inter
  FROM grams a JOIN grams b ON a.h = b.h AND a.g < b.g
  GROUP BY 1, 2
)
SELECT i.group_a, i.group_b,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       -- integral 6dp rounding (non-dyadic count-ratio midpoints)
       CAST(CASE WHEN (sa.n + sb.n - i.inter) > 0 THEN (2 * (i.inter) * 1000000 + (sa.n + sb.n - i.inter)) // (2 * (sa.n + sb.n - i.inter)) END AS DOUBLE) / 1000000.0 AS jaccard
FROM inter i
JOIN sizes sa ON sa.g = i.group_a
JOIN sizes sb ON sb.g = i.group_b
"""

QUERIES["source_overlap_matrix"] = (q_source_overlap_matrix, SOURCE_OVERLAP_MATRIX_SQL)


# ---- character-distribution quality ----
def q_char_diversity(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return text_ops.char_diversity(docs, "doc_id", "text")


CHAR_DIVERSITY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(lower(text), '')) AS c FROM documents
),
counts AS (
  SELECT doc_id, c, count(*) AS n FROM chars WHERE c != '' GROUP BY 1, 2
),
per AS (
  SELECT doc_id,
         CAST(sum(n) AS BIGINT) AS n_chars_counted,
         CAST(count(*) AS BIGINT) AS distinct_chars,
         max(n) AS top,
         sum(n * n) AS s2
  FROM counts GROUP BY 1
)
SELECT doc_id, n_chars_counted, distinct_chars,
       round(CAST(top AS DOUBLE) / n_chars_counted, 6) AS top_char_ratio,
       round(CAST(s2 AS DOUBLE)
             / (CAST(n_chars_counted AS DOUBLE) * n_chars_counted), 6)
         AS simpson_concentration,
       (round(CAST(top AS DOUBLE) / n_chars_counted, 6) < 0.2
        AND round(CAST(s2 AS DOUBLE)
                  / (CAST(n_chars_counted AS DOUBLE) * n_chars_counted), 6)
            < 0.1) AS keep
FROM per
"""

QUERIES["char_diversity_filter"] = (q_char_diversity, CHAR_DIVERSITY_SQL)


# =====================================================================
# Round-9 batch 2: BM25 retrieval, PMI collocations, referential
# integrity audit, time-hierarchy rollup, streaming online anomaly.
# =====================================================================

BM25_TERMS = ["spark", "merge", "window"]
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_topk(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return corpus_ops.bm25_topk(
        docs, "doc_id", "text", BM25_TERMS, k1=BM25_K1, b=BM25_B,
        top_n=20, keep_cols=["lang"],
    )


_BM25_IDF = (
    "round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)), 9)"
)
_BM25_W = (
    f"({_BM25_IDF} * (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0}))"
    f" / (CAST(tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B}"
    f" + {BM25_B} * CAST(len AS DOUBLE)"
    f" / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
)

BM25_TOPK_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS len,
         string_split(text, ' ') AS toks
  FROM documents
),
postings AS (
  SELECT doc_id, lang, len, t, count(*) AS tf
  FROM (SELECT doc_id, lang, len, unnest(toks) AS t FROM base)
  WHERE t IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
  GROUP BY 1, 2, 3, 4
),
cs AS (SELECT count(*) AS n_docs, sum(len) AS sum_len FROM base),
dfq AS (SELECT t, count(*) AS df FROM postings GROUP BY 1),
sc AS (
  SELECT p.doc_id, p.lang, p.t,
         CAST(round(round({_BM25_W}, 9) * 1e9) AS BIGINT) AS nanos
  FROM postings p JOIN dfq USING (t) CROSS JOIN cs
)
SELECT doc_id, lang,
       CAST(count(DISTINCT t) AS BIGINT) AS n_terms_matched,
       CAST((sum(nanos) + 500) // 1000 AS DOUBLE) / 1000000.0 AS score
FROM sc GROUP BY doc_id, lang
ORDER BY sum(nanos) DESC, doc_id LIMIT 20
"""

QUERIES["bm25_topk_docs"] = (q_bm25_topk, BM25_TOPK_SQL)


# ---- PMI collocations ----
PMI_MIN_COUNT = 5


def q_token_pmi_topk(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return corpus_ops.pmi_topk(docs, "text", min_count=PMI_MIN_COUNT, top_n=50)


TOKEN_PMI_TOPK_SQL = f"""
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
uni AS (
  SELECT t AS w, count(*) AS c_w
  FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
),
bi_all AS (
  SELECT w1, w2, count(*) AS c_bigram FROM (
    SELECT ts[CAST(i AS INTEGER)] AS w1, ts[CAST(i AS INTEGER) + 1] AS w2
    FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks)
  ) GROUP BY 1, 2
),
bi AS (SELECT * FROM bi_all WHERE c_bigram >= {PMI_MIN_COUNT}),
nu AS (SELECT sum(c_w) AS nu FROM uni),
nb AS (SELECT sum(c_bigram) AS nb FROM bi_all)
SELECT b.w1, b.w2,
       CAST(b.c_bigram AS BIGINT) AS c_bigram,
       CAST(u1.c_w AS BIGINT) AS c_w1,
       CAST(u2.c_w AS BIGINT) AS c_w2,
       round(ln((CAST(b.c_bigram AS DOUBLE) * CAST(nu AS DOUBLE)
                 * CAST(nu AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(u1.c_w AS DOUBLE)
                   * CAST(u2.c_w AS DOUBLE))), 6) + 0.0 AS pmi
FROM bi b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, b.w1, b.w2 LIMIT 50
"""

QUERIES["token_pmi_topk"] = (q_token_pmi_topk, TOKEN_PMI_TOPK_SQL)


# ---- referential integrity audit ----
RI_SPECS = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def q_referential_integrity(spark, sf_dir):
    """Warehouse FK health check: orphan counts per relationship via
    anti joins against distinct parent keys (operators/profile.py)."""
    from betl_spark.operators import profile as profile_ops

    specs = [
        (name, table(spark, sf_dir, c), [ck], table(spark, sf_dir, p), [pk])
        for name, c, ck, p, pk in RI_SPECS
    ]
    return profile_ops.referential_integrity(specs)


def _ri_spec_sql(name, child, ck, parent, pk) -> str:
    return f"""
SELECT '{name}' AS relationship,
  CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child,
  CAST((SELECT count(*) FROM {child} WHERE {ck} IS NULL) AS BIGINT)
    AS n_null_key,
  CAST((SELECT count(*) FROM {child} c
        LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{ck} = p.{pk}
        WHERE c.{ck} IS NOT NULL AND p.{pk} IS NULL) AS BIGINT) AS n_orphans,
  CASE WHEN (SELECT count(*) FROM {child} WHERE {ck} IS NOT NULL) > 0
       THEN round(
         CAST((SELECT count(*) FROM {child} c
               LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
                 ON c.{ck} = p.{pk}
               WHERE c.{ck} IS NOT NULL AND p.{pk} IS NULL) AS DOUBLE)
         / CAST((SELECT count(*) FROM {child} WHERE {ck} IS NOT NULL)
                AS DOUBLE), 6)
       END AS orphan_rate"""


REFERENTIAL_INTEGRITY_SQL = "\nUNION ALL\n".join(
    _ri_spec_sql(*s) for s in RI_SPECS
)

QUERIES["referential_integrity_audit"] = (
    q_referential_integrity,
    REFERENTIAL_INTEGRITY_SQL,
)


# ---- time-hierarchy rollup (partial ROLLUP grouping sets) ----
def q_events_time_rollup(spark, sf_dir):
    """Per-event-type calendar rollup: GROUP BY event_type,
    ROLLUP(year, month) — the continuous-aggregate hierarchy (leaf,
    monthly subtotal, yearly subtotal) in ONE pass; Spark plans
    grouping sets as a single Expand + hash aggregate, so the corpus
    is scanned once for all three levels."""
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    view = "events_r9_rollup"
    ev.select(
        "event_type",
        F.year(F.timestamp_micros(F.col("__ts_us"))).alias("y"),
        F.month(F.timestamp_micros(F.col("__ts_us"))).alias("m"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    ).createOrReplaceTempView(view)
    return ev.sparkSession.sql(f"""
        SELECT event_type, y, m,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(v) AS DOUBLE), 6) AS sum_value
        FROM {view}
        GROUP BY event_type, ROLLUP(y, m)
    """)


EVENTS_TIME_ROLLUP_SQL = """
WITH e AS (
  SELECT event_type, year(ts) AS y, month(ts) AS m,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
SELECT event_type, CAST(y AS INTEGER) AS y, CAST(m AS INTEGER) AS m,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(v) AS DOUBLE), 6) AS sum_value
FROM e
GROUP BY event_type, ROLLUP(y, m)
"""

QUERIES["events_time_rollup"] = (q_events_time_rollup, EVENTS_TIME_ROLLUP_SQL)


# ---- streaming online anomaly scores ----
ANOMALY_MIN_ROWS = 20
ANOMALY_THRESH = 3.0


def q_events_stream_anomaly(spark, sf_dir):
    """Online per-user anomaly scoring (applyInPandasWithState): each
    event z-scored against the user's expanding exact-integer history,
    batch-parity-checked against the equivalent windowed SQL."""
    from betl_spark.contract.streaming_delta import STATE_PARTS
    from betl_spark.streaming.events import (
        event_stream,
        run_stream_to_table,
        stateful_anomaly_scores,
    )

    stream = event_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_table(
        stateful_anomaly_scores(
            stream, min_rows=ANOMALY_MIN_ROWS, z_thresh=ANOMALY_THRESH
        ),
        output_mode="append",
        state_partitions=STATE_PARTS,
    )


EVENTS_STREAM_ANOMALY_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(value AS DOUBLE) AS v,
         CAST(round(value * 1000) AS BIGINT) AS milli
  FROM events
),
w AS (
  SELECT user_id, event_id, v, milli,
         count(*) OVER win AS n,
         sum(milli) OVER win AS s,
         sum(milli * milli) OVER win AS s2
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
sc AS (
  SELECT user_id, event_id, v AS value,
         CASE WHEN n >= {ANOMALY_MIN_ROWS}
                   AND (CAST(s2 AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                       / (n - 1) > 0.0
              THEN round((CAST(milli AS DOUBLE) - CAST(s AS DOUBLE) / n)
                         / sqrt((CAST(s2 AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                / (n - 1)), 6)
              END AS zscore
  FROM w
)
SELECT user_id, event_id, value, zscore,
       abs(zscore) > {ANOMALY_THRESH} AS is_anomaly
FROM sc
"""

QUERIES["events_stream_anomaly"] = (
    q_events_stream_anomaly,
    EVENTS_STREAM_ANOMALY_SQL,
)


# =====================================================================
# Round-9 batch 3: semi-structured shredding + sliding distinct actives
# =====================================================================

def q_json_props_stats(spark, sf_dir):
    """Schema-on-read JSON shredding (explicit schema — no inference
    pre-scan) of the events `props` blob, then typed per-event_type
    stats over the extracted field; broken documents and missing
    fields are counted, not dropped."""
    from betl_spark.operators.semistructured import shred_json

    ev = table(spark, sf_dir, "events")
    shredded = shred_json(
        ev, "props", {"k": "bigint"}, keep_cols=["event_type"]
    )
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("parse_ok")).cast("long")).alias("n_bad_json"),
        F.sum(
            (F.col("parse_ok") & F.col("k").isNull()).cast("long")
        ).alias("n_missing_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        # count("k")=0 (every row in the group bad/missing) must yield
        # NULL, not an ANSI DIVIDE_BY_ZERO abort (round-9 advisor item).
        F.when(
            F.count("k") > 0,
            F.round(
                F.sum("k").cast("double") / F.count("k").cast("double"), 6
            ),
        ).alias("avg_k"),
    )


JSON_PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type,
         CASE WHEN json_valid(props) THEN 0 ELSE 1 END AS bad,
         CASE WHEN json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
              END AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bad) AS BIGINT) AS n_bad_json,
       CAST(sum(CASE WHEN bad = 0 AND k IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k
FROM e GROUP BY event_type
"""

QUERIES["json_props_stats"] = (q_json_props_stats, JSON_PROPS_STATS_SQL)


# ---- rolling 7-day distinct active users ----
ACTIVE_WINDOW_DAYS = 7


def q_rolling_active_users(spark, sf_dir):
    """Trailing 7-day distinct users per day via contribution explode
    (a sliding DISTINCT has no frame decomposition; each event feeds
    the 7 windows that contain it, then one distinct agg)."""
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    return timeseries.rolling_distinct_count(
        ev, "__ts_us", "user_id", window_buckets=ACTIVE_WINDOW_DAYS
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS b
  FROM events WHERE ts IS NOT NULL
)
SELECT b + CAST(r.range AS BIGINT) AS bucket,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_entities,
       CAST(count(*) AS BIGINT) AS n_events
FROM e CROSS JOIN range({ACTIVE_WINDOW_DAYS}) r
GROUP BY 1
"""

QUERIES["rolling_active_users"] = (q_rolling_active_users, ROLLING_ACTIVE_USERS_SQL)


# =====================================================================
# Round-9 batch 4: exact-moment grouped Pearson (composed with JSON
# shredding) and the Markov event-transition matrix.
# =====================================================================

def q_grouped_corr_events(spark, sf_dir):
    """Per-event-type Pearson correlation between the typed value and
    a JSON-shredded property — exact moment sums (never builtin corr,
    whose double accumulation is partition-order-dependent), composed
    with schema-on-read shredding."""
    from betl_spark.operators.semistructured import shred_json

    ev = table(spark, sf_dir, "events")
    shredded = shred_json(
        ev, "props", {"k": "bigint"}, keep_cols=["event_type", "value"]
    )
    return stats_ops.grouped_pearson(
        shredded, ["event_type"], "value", "k", x_scale=2, y_scale=0
    )


GROUPED_CORR_EVENTS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(value AS DECIMAL(18,2)) AS x,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                        AS DECIMAL(18,0))
              END AS y
  FROM events
),
a AS (
  SELECT event_type,
         CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
              AS BIGINT) AS n,
         sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) AS sx,
         sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) AS sy,
         sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
                  THEN CAST(x * y AS DECIMAL(30,2)) END) AS sxy,
         sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
                  THEN CAST(x * x AS DECIMAL(30,4)) END) AS sxx,
         sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL
                  THEN CAST(y * y AS DECIMAL(30,0)) END) AS syy,
         min(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) AS nx,
         max(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) AS mx,
         min(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) AS ny,
         max(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) AS my
  FROM e GROUP BY 1
)
SELECT event_type, n,
       -- exact degeneracy gate (min < max on the quantized decimals)
       -- mirrors stats.grouped_pearson; the double var > 0 terms stay
       -- as the same NaN shield the Spark side evaluates
       CASE WHEN nx < mx AND ny < my
             AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
            THEN round(
              (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0
            END AS r
FROM a
"""

QUERIES["grouped_corr_events"] = (q_grouped_corr_events, GROUPED_CORR_EVENTS_SQL)


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams (operators/sessions.py:event_transitions)."""
    from betl_spark.operators.sessions import event_transitions

    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("__ts_us", ts_micros(ev))
    return event_transitions(ev, "user_id", "__ts_us", "event_id", "event_type")


EVENT_TRANSITIONS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type
  FROM events WHERE ts IS NOT NULL
),
pairs AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
           AS to_state
  FROM e
),
c AS (
  SELECT from_state, to_state, count(*) AS n
  FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_state, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.from_state, c.to_state, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS prob
FROM c JOIN tot USING (from_state)
"""

QUERIES["event_transitions"] = (q_event_transitions, EVENT_TRANSITIONS_SQL)


# =====================================================================
# Round-9 batch 5: KS drift between corpus slices, A/B proportion test
# =====================================================================

def q_ks_drift_sources(spark, sf_dir):
    """KS distribution-shift statistic on doc lengths between the
    first and second half of the source catalog — the binning-free
    companion to psi_drift, cumulated through the banded rank
    machinery (operators/profile.py:ks_drift)."""
    from betl_spark.operators.profile import ks_drift

    docs = table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    return ks_drift(
        docs.where(src_num < 10), docs.where(src_num >= 10), "n_chars"
    )


KS_DRIFT_SOURCES_SQL = """
WITH a AS (
  SELECT n_chars AS v FROM documents
  WHERE CAST(substr(source, 4) AS INTEGER) < 10 AND n_chars IS NOT NULL
),
b AS (
  SELECT n_chars AS v FROM documents
  WHERE CAST(substr(source, 4) AS INTEGER) >= 10 AND n_chars IS NOT NULL
),
ca AS (SELECT v, count(*) AS na FROM a GROUP BY 1),
cb AS (SELECT v, count(*) AS nb FROM b GROUP BY 1),
m AS (
  SELECT coalesce(ca.v, cb.v) AS v,
         coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
c AS (
  SELECT v, sum(na) OVER (ORDER BY v) AS cna,
         sum(nb) OVER (ORDER BY v) AS cnb
  FROM m
),
t AS (SELECT sum(na) AS ta, sum(nb) AS tb, count(*) AS nv FROM m),
d AS (
  SELECT max(CASE WHEN ta > 0 AND tb > 0
                  THEN abs(CAST(cna AS DOUBLE) / CAST(ta AS DOUBLE)
                           - CAST(cnb AS DOUBLE) / CAST(tb AS DOUBLE))
             END) AS mx
  FROM c CROSS JOIN t
)
SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
       CAST(nv AS BIGINT) AS n_values,
       round(mx, 6) AS ks_d
FROM t CROSS JOIN d
"""

QUERIES["ks_drift_sources"] = (q_ks_drift_sources, KS_DRIFT_SOURCES_SQL)


# ---- A/B proportion z-test ----
AB_SUCCESS_VALUE = 250.0


def q_ab_test_events(spark, sf_dir):
    """Two-proportion z-test per event_type over a deterministic
    md5-hash user split (variant A = even bucket): exact success/trial
    counts, one IEEE expression for z
    (operators/stats.py:ab_test_proportions)."""
    from betl_spark.operators.sampling import hash_bucket

    ev = table(spark, sf_dir, "events")
    # A NULL user_id has no arm: Spark's ~is_a is NULL (row lands in
    # neither bucket) while a bare CASE..ELSE would put it in B —
    # exclude NULL keys on BOTH sides (round-9 advisor item).
    ev = ev.where(F.col("user_id").isNotNull())
    return stats_ops.ab_test_proportions(
        ev,
        ["event_type"],
        hash_bucket("user_id", 2) == 0,
        F.col("value") > AB_SUCCESS_VALUE,
    )


AB_TEST_EVENTS_SQL = f"""
WITH e AS (
  SELECT event_type,
         (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
          % 2) = 0 AS is_a,
         CASE WHEN value > {AB_SUCCESS_VALUE} THEN 1 ELSE 0 END AS s
  FROM events WHERE user_id IS NOT NULL
),
a AS (
  SELECT event_type,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         sum(CASE WHEN is_a THEN s ELSE 0 END) AS sa,
         sum(CASE WHEN is_a THEN 0 ELSE s END) AS sb
  FROM e GROUP BY 1
)
SELECT event_type, n_a, n_b,
       CASE WHEN n_a > 0
            THEN round(CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE), 6) END
         AS conv_a,
       CASE WHEN n_b > 0
            THEN round(CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE), 6) END
         AS conv_b,
       CASE WHEN n_a > 0 AND n_b > 0
             AND CAST(sa + sb AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) > 0.0
             AND CAST(sa + sb AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) < 1.0
            THEN round(
              (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
              / sqrt(CAST(sa + sb AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
                     * (1.0 - CAST(sa + sb AS DOUBLE)
                              / CAST(n_a + n_b AS DOUBLE))
                     * (1.0 / CAST(n_a AS DOUBLE)
                        + 1.0 / CAST(n_b AS DOUBLE))), 6) + 0.0
            END AS z
FROM a
"""

QUERIES["ab_test_events"] = (q_ab_test_events, AB_TEST_EVENTS_SQL)
