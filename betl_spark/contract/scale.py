"""Contract queries for the beyond-reference scale operators
(dedup / similarity / text analysis / multimodal).

Where the testdata has no natural near-duplicates, the corpus is
augmented deterministically inside the query (docs unioned with
truncated copies at doc_id+100000) so the dedup operators have real
work to do — the oracle applies the identical augmentation in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table, ts_micros
from betl_spark.operators import dedup, multimodal, similarity, text

MUTANT_OFFSET = 100000


def _augmented_docs(spark, sf_dir):
    """documents ∪ near-duplicate mutants: text minus its last 20 chars,
    id + MUTANT_OFFSET. Restricted to doc_id < 50 to bound pair work."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    mutants = docs.select(
        (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
        F.expr("substring(text, 1, length(text) - 20)").alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mutants)


AUGMENTED_DOCS_SQL = f"""
  SELECT doc_id, text FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + {MUTANT_OFFSET} AS doc_id,
         substr(text, 1, length(text) - 20) AS text
  FROM documents WHERE doc_id < 50
"""


# ---- exact dedup (hash-groupBy) ----
def q_dedup_exact(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + MUTANT_OFFSET)
    )
    return dedup.exact_dedup(doubled, ["text"], "doc_id")


DEDUP_EXACT_SQL = f"""
WITH doubled AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + {MUTANT_OFFSET} AS doc_id, text, lang, source, n_chars FROM documents
)
SELECT min(doc_id) AS keep_id,
       md5(coalesce(text, chr(0) || 'NULL')) AS content_hash,
       count(*) AS n_copies
FROM doubled GROUP BY 2
"""


# ---- MinHash signatures ----
N_HASHES, SHINGLE_K, BANDS = 16, 5, 4


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(
        _augmented_docs(spark, sf_dir), "doc_id", "text", N_HASHES, SHINGLE_K
    )


MINHASH_SIG_CTE = f"""
  aug AS ({AUGMENTED_DOCS_SQL}),
  sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(0, length(text) - {SHINGLE_K - 1}),
             i -> substr(text, CAST(i AS INTEGER) + 1, {SHINGLE_K})))) AS shingle
    FROM aug
  ),
  sigs AS (
    SELECT doc_id, r.range AS h_idx,
           min(CAST(('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
    FROM sh CROSS JOIN range({N_HASHES}) r
    GROUP BY doc_id, r.range
  )
"""

MINHASH_SIGNATURES_SQL = f"WITH {MINHASH_SIG_CTE} SELECT doc_id, h_idx, minhash FROM sigs"


# ---- MinHash + LSH near-dup pairs ----
def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_near_dups(
        _augmented_docs(spark, sf_dir),
        "doc_id",
        "text",
        n_hashes=N_HASHES,
        bands=BANDS,
        min_est_jaccard=0.25,
    )


MINHASH_LSH_PAIRS_SQL = f"""
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
)
SELECT c.id_a, c.id_b,
       CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / {N_HASHES} AS est_jaccard
FROM cand c
JOIN sigs sa ON sa.doc_id = c.id_a
JOIN sigs sb ON sb.doc_id = c.id_b AND sb.h_idx = sa.h_idx
GROUP BY c.id_a, c.id_b
HAVING CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / {N_HASHES} >= 0.25
"""


# ---- exact n-gram Jaccard, verifying LSH candidates (the scale path) ----
def q_ngram_jaccard(spark, sf_dir):
    """Exact Jaccard scored ONLY on LSH candidate pairs — the 100 TB
    formulation (generate candidates by banded bucket join, verify the
    candidates exactly). The brute-force no-``pairs`` path of
    ``ngram_jaccard_pairs`` stays available for small-scope validation
    but is deliberately NOT what the contract exercises."""
    docs = _augmented_docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", N_HASHES, SHINGLE_K)
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BANDS)
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", SHINGLE_K, threshold=0.5, pairs=cand
    )


NGRAM_JACCARD_SQL = f"""
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
SELECT id_a, id_b, jaccard FROM (
  SELECT c.id_a, c.id_b,
         -- integral 6dp rounding (non-dyadic count-ratio midpoints)
         CAST(CASE WHEN (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) > 0 THEN (2 * (len(list_intersect(a.s, b.s))) * 1000000 + (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) // (2 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) END AS DOUBLE) / 1000000.0 AS jaccard
  FROM cand c
  JOIN shs a ON a.doc_id = c.id_a
  JOIN shs b ON b.doc_id = c.id_b
) WHERE jaccard >= 0.5
"""


# ---- SimHash fingerprints ----
SIMHASH_BITS = 48


def q_simhash(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.simhash(docs, "doc_id", "text", SIMHASH_BITS)


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ts
  FROM documents WHERE doc_id < 100
),
hashed AS (
  SELECT doc_id,
         list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
  FROM toks
)
SELECT doc_id,
       CAST(list_sum(list_transform(range({SIMHASH_BITS}), j ->
         CASE WHEN list_sum(list_transform(hs, h ->
                CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER) ELSE 0 END)) AS BIGINT) AS simhash
FROM hashed
"""


# ---- end-to-end near-dup REMOVAL: LSH pairs → components → survivors ----
def q_near_dup_removal(spark, sf_dir):
    """The full dedup ladder as one flow: MinHash-LSH candidate pairs →
    estimated-Jaccard filter → connected components → keep only each
    cluster's canonical (minimum-id) document plus all unpaired docs.
    This is the query a corpus curator actually runs; every stage is an
    operator proven separately above."""
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.minhash_near_dups(
        aug, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS, min_est_jaccard=0.25
    )
    clusters = dedup.duplicate_clusters(pairs.select("id_a", "id_b"), edges_unique=True)
    return (
        aug.join(clusters, aug.doc_id == clusters.node, "left")
        .filter(F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")))
        .select("doc_id", F.length("text").alias("n_chars"))
    )


NEAR_DUP_REMOVAL_SQL = f"""
WITH RECURSIVE aug AS ({AUGMENTED_DOCS_SQL}),
pairs AS (SELECT id_a, id_b FROM ({MINHASH_LSH_PAIRS_SQL})),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label AS label
  FROM reach r JOIN edges e ON e.src = r.node
),
clusters AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node)
SELECT a.doc_id, CAST(length(a.text) AS INTEGER) AS n_chars
FROM aug a LEFT JOIN clusters c ON a.doc_id = c.node
WHERE c.cluster_id IS NULL OR a.doc_id = c.cluster_id
"""


# ---- SimHash banded near-dup pairs ----
def q_simhash_near_dups(spark, sf_dir):
    return dedup.simhash_near_dups(
        _augmented_docs(spark, sf_dir), "doc_id", "text",
        n_bits=SIMHASH_BITS, bands=4, max_hamming=3,
    )


SIMHASH_NEAR_DUPS_SQL = f"""
WITH aug AS ({AUGMENTED_DOCS_SQL}),
toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ts FROM aug
),
hashed AS (
  SELECT doc_id,
         list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
  FROM toks
),
fp AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range({SIMHASH_BITS}), j ->
           CASE WHEN list_sum(list_transform(hs, h ->
                  CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER) ELSE 0 END)) AS BIGINT) AS simhash
  FROM hashed
),
banded AS (
  SELECT doc_id, simhash, b.range AS band,
         (simhash >> (CAST(b.range AS INTEGER) * {SIMHASH_BITS // 4})) & {(1 << (SIMHASH_BITS // 4)) - 1} AS slice
  FROM fp CROSS JOIN range(4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS fa, b.simhash AS fb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
"""


# ---- embedding cosine top-k (brute force) ----
def q_similarity_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, "vec_id", "embedding", list(range(10)), k=5)


SIMILARITY_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.qv, e.embedding),
                    p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
           / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cosine_sim
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id != e.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


# ---- embedding-cosine near-dup pairs (LSH-bucketed scale path) ----
def q_dedup_embedding_cosine(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    return similarity.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.2, n_planes=4, dim=64
    )


_COSINE_PAIR = """
round(
  list_sum(list_transform(list_zip(a.embedding, b.embedding),
           p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
  / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
  6)
"""

# the oracle replays the identical md5-derived hyperplane bucketing
# (N_PLANES=4 over EMB_DIM=64), so it scores exactly the same-bucket
# candidate pairs the engine's scale path scores
DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH be AS (
  SELECT vec_id, embedding, {{bucket}} AS bucket
  FROM embeddings WHERE vec_id < 150
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_PAIR} AS cosine_sim
FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_COSINE_PAIR} >= 0.2
"""


# ---- ANN: LSH-bucketed cosine top-k (the scale path) ----
N_PLANES, EMB_DIM = 4, 64


def q_similarity_ann_lsh(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_bucket_topk(
        emb, "vec_id", "embedding", list(range(10)), k=5,
        n_planes=N_PLANES, dim=EMB_DIM,
    )


def _plane_literal(plane: int) -> str:
    """The md5-derived ±1 hyperplane as a DuckDB list literal — computed
    here with hashlib so the oracle needs no md5 bit-twiddling (must stay
    in lockstep with similarity._plane_signs)."""
    import hashlib

    comps = []
    for j in range(EMB_DIM):
        h = int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[:2], 16)
        comps.append("1.0" if h % 2 == 0 else "-1.0")
    return "[" + ", ".join(comps) + "]"


def _bucket_sql(tbl: str) -> str:
    terms = []
    for i in range(N_PLANES):
        dot = (
            f"list_sum(list_transform(list_zip({tbl}.embedding, {_plane_literal(i)}),"
            f" p -> CAST(struct_extract(p, 1) AS DOUBLE) * struct_extract(p, 2)))"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {2 ** i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


# now that the bucket SQL builder exists, finalize the bucketed
# near-dup oracle (template declared above, next to its query)
DEDUP_EMBEDDING_COSINE_SQL = DEDUP_EMBEDDING_COSINE_SQL.format(
    bucket=_bucket_sql("embeddings")
)

SIMILARITY_ANN_LSH_SQL = f"""
WITH be AS (
  SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket FROM embeddings
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COSINE_PAIR} AS cosine_sim
  FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
  WHERE a.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


# ---- as-of (point-in-time) join ----
def q_asof_join_events(spark, sf_dir):
    """Each click gets the most recent prior purchase value for its
    user — the union-window as-of join (operators/asof.py), checked
    against DuckDB's native ASOF LEFT JOIN."""
    from betl_spark.operators import asof

    # epoch-micros event time on both sides: DuckDB evaluates at micro
    # precision and the testdata has no same-microsecond collisions per
    # user (verified), so micros are the common clock. ts_micros() is
    # type-adaptive — the parquet physical type has shifted across
    # driver rounds (nanos -> micros).
    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("ts", ts_micros(ev))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.col("value").cast("double")).alias("purchase_value"))
        .select("user_id", "ts", "purchase_value")
    )
    out = asof.asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["purchase_value"]
    )
    return out.select("event_id", "user_id", "ts", "purchase_value_asof")


ASOF_JOIN_EVENTS_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, epoch_us(ts) AS t,
         MAX(CAST(value AS DOUBLE)) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts, p.purchase_value AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.t
"""


# ---- range (interval) join ----
def q_interval_join_events(spark, sf_dir):
    """Events matched to per-type 'incident windows' (30 min from each
    type's first event) — a pure range join with no equi key, run
    through the bucketed formulation (operators/ranges.py) and checked
    against DuckDB's plain inequality join."""
    from betl_spark.operators.ranges import interval_join

    ev = table(spark, sf_dir, "events")
    ev = ev.withColumn("ts", ts_micros(ev))
    windows = (
        ev.groupBy(F.col("event_type").alias("win_type"))
        .agg(F.min("ts").alias("start_us"))
        .withColumn("end_us", F.col("start_us") + F.lit(30 * 60 * 1_000_000))
    )
    points = ev.select("event_id", "ts")
    out = interval_join(points, windows, "ts", "start_us", "end_us",
                        bucket_width=5 * 60 * 1_000_000)
    return out.select("event_id", "win_type", "ts")


INTERVAL_JOIN_EVENTS_SQL = """
WITH e AS (SELECT event_id, epoch_us(ts) AS ts FROM events),
iv AS (
  SELECT event_type AS win_type, MIN(epoch_us(ts)) AS s
  FROM events GROUP BY 1
)
SELECT e.event_id, iv.win_type, e.ts
FROM e JOIN iv ON e.ts >= iv.s AND e.ts < iv.s + 1800000000
"""


# ---- salted join (manual skew handling beyond AQE) ----
EVENT_CATEGORIES = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "revenue"),
    ("signup", "growth"),
    ("error", "ops"),
]


def q_salted_join_events(spark, sf_dir):
    from betl_spark.operators import skew

    events = table(spark, sf_dir, "events")
    dim = spark.createDataFrame(EVENT_CATEGORIES, ["event_type", "category"])
    joined = skew.salted_join(
        events, dim, on=["event_type"], salt_by="event_id", n_salt=8
    )
    return (
        joined.groupBy("category")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


SALTED_JOIN_EVENTS_SQL = """
WITH dim(event_type, category) AS (
  VALUES ('click', 'engagement'), ('view', 'engagement'),
         ('purchase', 'revenue'), ('signup', 'growth'), ('error', 'ops')
)
SELECT d.category,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY d.category
"""


# ---- PII scrub (regex redaction at scan speed) ----
def q_pii_scrub(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    # deterministic augmentation: every 3rd doc gets appended PII so
    # the scrub has real work (the synthetic corpus has none)
    withpii = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 at 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return withpii.select(
        "doc_id",
        text.pii_counts("text", "email").alias("n_emails"),
        text.pii_counts("text", "phone").alias("n_phones"),
        text.pii_counts("text", "ipv4").alias("n_ips"),
        F.md5(text.pii_redact("text")).alias("redacted_hash"),
    )


PII_SCRUB_SQL = r"""
WITH withpii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567 at 10.0.0.'
                   || CAST(doc_id % 256 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g')) AS redacted_hash
FROM withpii
"""


# ---- duplicate clustering: pairs → connected components ----
def q_dedup_clusters(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    pairs = similarity.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.2)
    return dedup.duplicate_clusters(pairs, edges_unique=True)


# The oracle computes the same components with a recursive CTE:
# min reachable id == cluster id (the pair graph is undirected).
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 150 AND b.vec_id < 150
    AND {_COSINE_PAIR} >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label AS label
  FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
"""


# ---- ANN: IVF (inverted-file) probe top-k ----
IVF_CENTROID_IDS = [100, 200, 300, 400, 500, 600, 700, 800]
IVF_NPROBE = 2


def q_similarity_ann_ivf(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, "vec_id", "embedding", list(range(10)),
        centroid_ids=IVF_CENTROID_IDS, k=5, nprobe=IVF_NPROBE,
    )


_CELL_COS = """
round(
  list_sum(list_transform(list_zip(e.embedding, c.embedding),
           p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
  6)
"""

SIMILARITY_ANN_IVF_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cell_id, embedding FROM embeddings
  WHERE vec_id IN ({", ".join(str(i) for i in IVF_CENTROID_IDS)})
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_CELL_COS} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN (SELECT cell_id, embedding FROM cent) c
),
corpus AS (SELECT vec_id, embedding, cell_id FROM assign WHERE cell_rank = 1),
probes AS (
  SELECT vec_id, embedding, cell_id FROM assign
  WHERE vec_id < 10 AND cell_rank <= {IVF_NPROBE}
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


# ---- spherical k-means update step (IVF index training) ----
def q_kmeans_update(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return similarity.centroid_update(emb, "vec_id", "embedding", IVF_CENTROID_IDS)


KMEANS_UPDATE_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cell_id, embedding FROM embeddings
  WHERE vec_id IN ({", ".join(str(i) for i in IVF_CENTROID_IDS)})
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_CELL_COS} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN (SELECT cell_id, embedding FROM cent) c
),
corpus AS (SELECT vec_id, embedding, cell_id FROM assign WHERE cell_rank = 1),
expl AS (
  SELECT cell_id, CAST(r.range AS INTEGER) AS pos,
         CAST(embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE) AS val
  FROM corpus CROSS JOIN range({EMB_DIM}) r
)
SELECT cell_id, pos, round(avg(val), 6) AS centroid_val
FROM expl GROUP BY 1, 2
"""


# ---- token counting: whitespace + BPE-ish regex ----
def q_token_count(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_ws_tokens"),
        F.size(text.bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    )


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(list_filter(
         string_split_regex(regexp_replace(text, '([^ \w]|\d+)', ' \1 ', 'g'), ' +'),
         t -> t != '')) AS INTEGER) AS n_bpe_tokens
FROM documents
"""


# ---- text quality features ----
def q_text_quality(spark, sf_dir):
    return text.text_quality(table(spark, sf_dir, "documents"), "doc_id", "text")


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         CAST(length(text) AS INTEGER) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains(['the','and','of','to','in','is','that','with'], w))) AS INTEGER) AS n_stop,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INTEGER) AS n_punct
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio
FROM t
"""


# ---- language ID heuristic ----
def q_lang_id(spark, sf_dir):
    return text.lang_id(table(spark, sf_dir, "documents"), "doc_id", "text")


def _lang_hits_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"w -> list_contains([{words}], w))) AS BIGINT)"
    )


_LANGS = sorted(text.LANG_STOPWORDS)
_BEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANGS) + ")"
_PRED = "CASE "
for _lang in _LANGS:
    _PRED += f"WHEN hits_{_lang} = {_BEST} AND {_BEST} > 0 THEN '{_lang}' "
_PRED += "ELSE 'und' END"

LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         {", ".join(f"{_lang_hits_sql(lang)} AS hits_{lang}" for lang in _LANGS)}
  FROM documents
)
SELECT doc_id, {_PRED} AS lang_pred, {_BEST} AS lang_hits
FROM scored
"""


# ---- document fingerprints ----
def q_doc_fingerprint(spark, sf_dir):
    return text.doc_fingerprint(table(spark, sf_dir, "documents"), "doc_id", "text")


DOC_FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS content_md5,
       list_min(list_transform(range(0, length(text) - 7, 4),
         i -> CAST(('0x' || substr(md5(substr(text, CAST(i AS INTEGER) + 1, 8)), 1, 15)) AS BIGINT))) AS min_shingle_hash
FROM documents
"""


# ---- corpus curation: the composed training-data pipeline ----
def q_corpus_curation(spark, sf_dir):
    """lang-ID → quality features → exact dedup → per-source stats:
    the standard curation ladder as ONE lazy plan. Every stage is a
    column expression or one hash shuffle; nothing leaves the JVM."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"), "text", "source"
    )
    corpus = docs.unionByName(copies)
    lang = text.lang_id(corpus, "doc_id", "text").select("doc_id", "lang_pred")
    qual = text.text_quality(corpus, "doc_id", "text").select(
        "doc_id", "n_tokens", "stopword_ratio"
    )
    keep = dedup.exact_dedup(corpus, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    kept = (
        corpus.join(keep, "doc_id")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter((F.col("n_tokens") >= 25) & (F.col("lang_pred") != "und"))
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("stopword_ratio").alias("max_stopword_ratio"),
    )


CORPUS_CURATION_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {MUTANT_OFFSET} AS doc_id, text, source
  FROM documents WHERE doc_id % 5 = 0
),
lang_scored AS (
  SELECT doc_id,
         {", ".join(f"{_lang_hits_sql(lang)} AS hits_{lang}" for lang in sorted(text.LANG_STOPWORDS))}
  FROM corpus
),
lang AS (SELECT doc_id, {_PRED} AS lang_pred FROM lang_scored),
qual AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         round(CAST(len(list_filter(string_split(text, ' '),
               w -> list_contains(['the','and','of','to','in','is','that','with'], w))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS stopword_ratio
  FROM corpus
),
keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text))
SELECT c.source,
       COUNT(*) AS n_docs,
       CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
       MAX(q.stopword_ratio) AS max_stopword_ratio
FROM corpus c
JOIN keep k ON c.doc_id = k.doc_id
JOIN lang l ON c.doc_id = l.doc_id
JOIN qual q ON c.doc_id = q.doc_id
WHERE q.n_tokens >= 25 AND l.lang_pred != 'und'
GROUP BY c.source
"""


# ---- multimodal: binary wrap + metadata ----
def q_multimodal_binary(spark, sf_dir):
    media = multimodal.attach_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return media.select(
        "media_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


MULTIMODAL_BINARY_SQL = """
SELECT doc_id AS media_id, 'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


# ---- multimodal: Arrow-batched fake decode vs pure-SQL oracle ----
def q_multimodal_decode(spark, sf_dir):
    media = multimodal.attach_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return multimodal.decode_features(media, decoder="fake")


MULTIMODAL_DECODE_SQL = """
SELECT doc_id AS media_id,
       -- coalesce matches the fake decoder, which hashes b'' for NULL
       CAST(1 + CAST(('0x' || substr(md5(coalesce(text, '')), 1, 4)) AS INTEGER) % 2048 AS INTEGER) AS width,
       CAST(1 + CAST(('0x' || substr(md5(coalesce(text, '')), 5, 4)) AS INTEGER) % 2048 AS INTEGER) AS height,
       CAST(1 + CAST(('0x' || substr(md5(coalesce(text, '')), 9, 4)) AS INTEGER) % 300 AS INTEGER) AS n_frames,
       md5(coalesce(text, '')) AS feature_hash
FROM documents
"""


# ---- deterministic sampling / corpus splits ----
def q_split_assign(spark, sf_dir):
    from betl_spark.operators import sampling

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return sampling.deterministic_split(docs, "doc_id", val_pct=10, test_pct=10)


SPLIT_ASSIGN_SQL = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 10 THEN 'val'
            WHEN bucket < 20 THEN 'test'
            ELSE 'train' END AS split
FROM b
"""


def q_hash_sample(spark, sf_dir):
    from betl_spark.operators import sampling

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return sampling.hash_sample(docs, "doc_id", fraction=0.2)


HASH_SAMPLE_SQL = """
SELECT doc_id
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 2000
"""


# ---- multimodal: aspect-fit resize + frame-sample plans ----
def q_multimodal_resize(spark, sf_dir):
    media = multimodal.attach_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return multimodal.resize_plan(media, max_width=256, max_height=256)


# geometry replayed in SQL: same md5-derived dims, same IEEE min/floor
MULTIMODAL_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         1 + CAST(('0x' || substr(md5(coalesce(text, '')), 1, 4)) AS INTEGER) % 2048 AS ow,
         1 + CAST(('0x' || substr(md5(coalesce(text, '')), 5, 4)) AS INTEGER) % 2048 AS oh
  FROM documents
), scaled AS (
  SELECT media_id, ow, oh,
         LEAST(256.0 / ow, 256.0 / oh, 1.0) AS s
  FROM dims
)
SELECT media_id,
       CAST(ow AS INTEGER) AS orig_width,
       CAST(oh AS INTEGER) AS orig_height,
       CAST(GREATEST(1, FLOOR(ow * s)) AS INTEGER) AS width,
       CAST(GREATEST(1, FLOOR(oh * s)) AS INTEGER) AS height,
       CAST(s AS DOUBLE) AS scale
FROM scaled
"""


def q_multimodal_frame_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    media = multimodal.attach_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    plan = multimodal.frame_sample_plan(media, every_nth=30)
    return plan.select("media_id", F.col("frame_idx").cast("long").alias("frame_idx"))


MULTIMODAL_FRAME_SAMPLE_SQL = """
WITH feats AS (
  SELECT doc_id AS media_id,
         1 + CAST(('0x' || substr(md5(coalesce(text, '')), 9, 4)) AS INTEGER) % 300 AS n_frames
  FROM documents
)
SELECT media_id,
       CAST(unnest(generate_series(0, n_frames - 1, 30)) AS BIGINT) AS frame_idx
FROM feats
"""


# ---- Gopher-style rule filter ----
def q_quality_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    # deterministic augmentation: every 4th doc gets symbol noise so the
    # symbol-ratio rule has real work (the synthetic corpus is clean)
    noisy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" ### ... #noise ... #"),
            ),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return text.quality_filter(noisy, "doc_id", "text", min_tokens=60)


QUALITY_FILTER_SQL = r"""
WITH noisy AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN coalesce(text, '') || ' ### ... #noise ... #'
              ELSE coalesce(text, '') END AS text
  FROM documents
),
t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len,
         round(CAST(len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS symbol_ratio,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains(['the','and','of','to','in','is','that','with'], w))) AS INTEGER) AS stopword_hits
  FROM noisy
)
SELECT doc_id, n_tokens, avg_token_len, symbol_ratio, stopword_hits,
       (n_tokens >= 60 AND n_tokens <= 100000
        AND avg_token_len >= 3.0 AND avg_token_len <= 10.0
        AND symbol_ratio <= 0.1 AND stopword_hits >= 2) AS keep
FROM t
"""


# ---- corpus: vocabulary / TF-IDF / bigrams / packing / stratified mix ----
def q_vocab_topk(spark, sf_dir):
    from betl_spark.operators import corpus

    return corpus.token_frequencies(
        table(spark, sf_dir, "documents"), "doc_id", "text", top_k=100
    )


VOCAB_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
  FROM toks GROUP BY token
),
ranked AS (
  SELECT token, n_docs, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, token) AS r
  FROM counts
)
SELECT token, n_docs, n_occurrences FROM ranked WHERE r <= 100
"""


def q_tf_idf(spark, sf_dir):
    from betl_spark.operators import corpus

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return corpus.tf_idf(docs, "doc_id", "text", min_doc_freq=2)


TF_IDF_SQL = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dfreq AS (
  SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token
  HAVING COUNT(*) >= 2
)
SELECT t.doc_id, t.token, t.tf,
       round(t.tf * ln(CAST((SELECT COUNT(*) FROM docs) AS DOUBLE) / d.doc_freq), 6) AS tfidf
FROM tf t JOIN dfreq d USING (token)
"""


def q_bigram_counts(spark, sf_dir):
    from betl_spark.operators import corpus

    return corpus.bigram_counts(table(spark, sf_dir, "documents"), "text", min_count=5)


BIGRAM_COUNTS_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
b AS (
  SELECT unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS p
  FROM t WHERE len(ts) >= 2
)
SELECT struct_extract(p, 1) AS w1, struct_extract(p, 2) AS w2, COUNT(*) AS n
FROM b GROUP BY 1, 2 HAVING COUNT(*) >= 5
"""


def q_repetition_features(spark, sf_dir):
    from betl_spark.operators import corpus

    docs = table(spark, sf_dir, "documents")
    # every 6th doc gets a repeated-boilerplate tail so the repetition
    # signals have real spread (the synthetic corpus barely repeats)
    noisy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.col("text"), F.lit(" buy now buy now buy now buy now")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus.repetition_features(noisy, "doc_id", "text")


REPETITION_FEATURES_SQL = """
WITH noisy AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0 THEN text || ' buy now buy now buy now buy now'
              ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM noisy),
base AS (
  SELECT doc_id, CAST(len(ts) AS INTEGER) AS n,
         CAST(len(list_distinct(ts)) AS INTEGER) AS nd, ts
  FROM toks
),
bg AS (
  SELECT doc_id, unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS p
  FROM base WHERE n >= 2
),
cnt AS (SELECT doc_id, p, COUNT(*) AS c FROM bg GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(c) AS mc FROM cnt GROUP BY doc_id)
SELECT b.doc_id, b.n AS n_tokens,
       round(1.0 - CAST(b.nd AS DOUBLE) / b.n, 6) AS dup_token_fraction,
       CASE WHEN b.n > 1
            THEN round(CAST(COALESCE(t.mc, 0) AS DOUBLE) / (b.n - 1), 6)
            ELSE 0.0 END AS top_bigram_fraction
FROM base b LEFT JOIN top t USING (doc_id)
"""


def q_pack_sequences(spark, sf_dir):
    from betl_spark.operators import corpus

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )
    return corpus.pack_sequences(docs, "doc_id", "n_tokens", budget=2048, n_shards=16)


PACK_SEQUENCES_SQL = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS shard
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, shard,
         SUM(CAST(n_tokens AS BIGINT)) OVER (
           PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING
         ) - n_tokens AS start_offset
  FROM d
)
SELECT doc_id, n_tokens, shard,
       CAST(FLOOR(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT) AS chunk
FROM c
"""


def q_stratified_sample(spark, sf_dir):
    from betl_spark.operators import sampling

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.stratified_hash_sample(
        docs, "doc_id", "source", {"src0": 0.5, "src1": 0.1}, default_fraction=0.25
    )


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 <
      CASE WHEN source = 'src0' THEN 5000
           WHEN source = 'src1' THEN 1000
           ELSE 2500 END
"""


# ---- multimodal: audio chunking plan ----
def q_multimodal_audio_chunks(spark, sf_dir):
    media = multimodal.attach_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text", media_type="audio"
    )
    return multimodal.audio_chunk_plan(media, chunk_ms=10_000)


MULTIMODAL_AUDIO_CHUNKS_SQL = """
WITH a AS (
  SELECT doc_id AS media_id,
         1 + CAST(('0x' || substr(md5(text), 13, 8)) AS BIGINT) % 600000 AS duration_ms
  FROM documents
),
s AS (
  SELECT media_id, duration_ms,
         unnest(generate_series(0, duration_ms - 1, 10000)) AS start_ms
  FROM a
)
SELECT media_id, duration_ms,
       CAST(start_ms // 10000 AS INTEGER) AS chunk_idx,
       CAST(start_ms AS BIGINT) AS start_ms,
       LEAST(start_ms + 10000, duration_ms) AS end_ms
FROM s
"""


QUERIES = {
    "dedup_exact": (q_dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_signatures": (q_minhash_signatures, MINHASH_SIGNATURES_SQL),
    "dedup_minhash_lsh_pairs": (q_minhash_lsh_pairs, MINHASH_LSH_PAIRS_SQL),
    "dedup_ngram_jaccard": (q_ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_simhash": (q_simhash, SIMHASH_SQL),
    "dedup_simhash_near_dups": (q_simhash_near_dups, SIMHASH_NEAR_DUPS_SQL),
    "near_dup_removal": (q_near_dup_removal, NEAR_DUP_REMOVAL_SQL),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
    "similarity_topk": (q_similarity_topk, SIMILARITY_TOPK_SQL),
    "similarity_ann_lsh": (q_similarity_ann_lsh, SIMILARITY_ANN_LSH_SQL),
    "similarity_ann_ivf": (q_similarity_ann_ivf, SIMILARITY_ANN_IVF_SQL),
    "kmeans_update": (q_kmeans_update, KMEANS_UPDATE_SQL),
    "dedup_cluster_assign": (q_dedup_clusters, DEDUP_CLUSTERS_SQL),
    "pii_scrub": (q_pii_scrub, PII_SCRUB_SQL),
    "salted_join_events": (q_salted_join_events, SALTED_JOIN_EVENTS_SQL),
    "asof_join_events": (q_asof_join_events, ASOF_JOIN_EVENTS_SQL),
    "interval_join_events": (q_interval_join_events, INTERVAL_JOIN_EVENTS_SQL),
    "corpus_curation": (q_corpus_curation, CORPUS_CURATION_SQL),
    "token_count": (q_token_count, TOKEN_COUNT_SQL),
    "text_quality": (q_text_quality, TEXT_QUALITY_SQL),
    "lang_id": (q_lang_id, LANG_ID_SQL),
    "doc_fingerprint": (q_doc_fingerprint, DOC_FINGERPRINT_SQL),
    "multimodal_binary": (q_multimodal_binary, MULTIMODAL_BINARY_SQL),
    "multimodal_decode": (q_multimodal_decode, MULTIMODAL_DECODE_SQL),
    "multimodal_resize": (q_multimodal_resize, MULTIMODAL_RESIZE_SQL),
    "multimodal_frame_sample": (q_multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL),
    "multimodal_audio_chunks": (q_multimodal_audio_chunks, MULTIMODAL_AUDIO_CHUNKS_SQL),
    "split_assign": (q_split_assign, SPLIT_ASSIGN_SQL),
    "hash_sample": (q_hash_sample, HASH_SAMPLE_SQL),
    "quality_filter": (q_quality_filter, QUALITY_FILTER_SQL),
    "vocab_topk": (q_vocab_topk, VOCAB_TOPK_SQL),
    "tf_idf": (q_tf_idf, TF_IDF_SQL),
    "bigram_counts": (q_bigram_counts, BIGRAM_COUNTS_SQL),
    "pack_sequences": (q_pack_sequences, PACK_SEQUENCES_SQL),
    "repetition_features": (q_repetition_features, REPETITION_FEATURES_SQL),
    "stratified_sample": (q_stratified_sample, STRATIFIED_SAMPLE_SQL),
}
