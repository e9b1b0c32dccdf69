"""Round-7 contract queries: two-level (coarse-quantized) semantic
dedup for the 10^6-10^7-centroid regime, the paper-faithful SemDeDup
survivor policy, and bucketed-storage incremental exact dedup.

Same determinism rules as round 6: cosines and centroid means round to
6dp before any comparison, survivor choices are total orders, and the
oracle replays identical arithmetic in DuckDB.
"""

from __future__ import annotations

from betl_spark.contract.common import table
from betl_spark.contract.round6 import (
    DEDUP_BLOOM_INCREMENTAL_SQL,
    REF_CUTOFF,
    SEMANTIC_PAIR_CC_CTES,
    SEMANTIC_THRESHOLD,
    SEMANTIC_TRAIN_CTES,
    _COS_E_CV,
)
from betl_spark.contract.scale import IVF_CENTROID_IDS, MUTANT_OFFSET

# coarse model = every 3rd trained centroid (~sqrt(k) of them at real
# scale; 3 of 8 here) — the only piece the two-level assignment
# broadcasts
COARSE_CENTROID_IDS = [100, 400, 700]


def _cos_sql(a: str, b: str) -> str:
    """6dp cosine between two DuckDB list expressions — the generic
    form of round6's ``_COS_E_CV`` (CAST on DOUBLE is a no-op, so one
    helper serves float embeddings and double centroid lists)."""
    return f"""
round(
  list_sum(list_transform(list_zip({a}, {b}),
           p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
  / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
  6)
"""


def q_semantic_dedup_2level(spark, sf_dir):
    """SemDeDup with IVF-style two-level cell assignment — the scale
    path past the single-level operator's centroid-broadcast bound."""
    from betl_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup_2level(
        emb, "vec_id", "embedding", IVF_CENTROID_IDS, COARSE_CENTROID_IDS,
        threshold=SEMANTIC_THRESHOLD,
    )


SEMANTIC_DEDUP_2LEVEL_SQL = f"""
WITH RECURSIVE {SEMANTIC_TRAIN_CTES},
coarse AS (
  SELECT cell_id AS coarse_id, cv AS ccv FROM tcent
  WHERE cell_id IN ({", ".join(str(i) for i in COARSE_CENTROID_IDS)})
),
f2c0 AS (
  SELECT t.cell_id, t.cv, c.coarse_id,
         row_number() OVER (
           PARTITION BY t.cell_id
           ORDER BY {_cos_sql("t.cv", "c.ccv")} DESC, c.coarse_id
         ) AS rk
  FROM tcent t CROSS JOIN coarse c
),
f2c AS (SELECT cell_id, cv, coarse_id FROM f2c0 WHERE rk = 1),
r2c0 AS (
  SELECT e.vec_id, e.embedding, c.coarse_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_cos_sql("e.embedding", "c.ccv")} DESC, c.coarse_id
         ) AS rk
  FROM embeddings e CROSS JOIN coarse c
),
r2c AS (SELECT vec_id, embedding, coarse_id FROM r2c0 WHERE rk = 1),
corpus0 AS (
  SELECT r.vec_id, r.embedding, f.cell_id,
         row_number() OVER (
           PARTITION BY r.vec_id
           ORDER BY {_cos_sql("r.embedding", "f.cv")} DESC, f.cell_id
         ) AS rk
  FROM r2c r JOIN f2c f ON r.coarse_id = f.coarse_id
),
corpus AS (SELECT vec_id, embedding, cell_id FROM corpus0 WHERE rk = 1),
{SEMANTIC_PAIR_CC_CTES}
SELECT c.vec_id, c.cell_id
FROM corpus c LEFT JOIN clusters cl ON c.vec_id = cl.node
WHERE cl.cluster_id IS NULL OR c.vec_id = cl.cluster_id
"""


def q_semantic_dedup_medoid(spark, sf_dir):
    """SemDeDup with the paper's survivor policy: keep the cluster
    member LEAST similar to its trained centroid (arXiv:2303.09540 §2),
    tiebroken by minimum id."""
    from betl_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, "vec_id", "embedding", IVF_CENTROID_IDS,
        threshold=SEMANTIC_THRESHOLD, survivor="min_centroid_sim",
    )


SEMANTIC_DEDUP_MEDOID_SQL = f"""
WITH RECURSIVE {SEMANTIC_TRAIN_CTES},
assign1 AS (
  SELECT e.vec_id, e.embedding, c.cell_id, {_COS_E_CV} AS cs,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY {_COS_E_CV} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN tcent c
),
corpus AS (
  SELECT vec_id, embedding, cell_id, cs FROM assign1 WHERE cell_rank = 1
),
{SEMANTIC_PAIR_CC_CTES},
winners AS (
  SELECT cl.cluster_id, c.vec_id,
         row_number() OVER (
           PARTITION BY cl.cluster_id ORDER BY c.cs, c.vec_id
         ) AS rk
  FROM corpus c JOIN clusters cl ON c.vec_id = cl.node
),
keep AS (SELECT cluster_id, vec_id AS keep_id FROM winners WHERE rk = 1)
SELECT c.vec_id, c.cell_id
FROM corpus c
LEFT JOIN clusters cl ON c.vec_id = cl.node
LEFT JOIN keep k ON cl.cluster_id = k.cluster_id
WHERE cl.cluster_id IS NULL OR c.vec_id = k.keep_id
"""


def q_dedup_bloom_bucketed(spark, sf_dir):
    """Incremental exact dedup against a reference corpus stored as a
    content_hash-BUCKETED table (the daily-ingest storage contract):
    the exact anti join reads the bucket layout instead of shuffling
    the corpus — only the ingest batch exchanges. Same batch/ref split
    and same answer as ``dedup_bloom_incremental``; the storage layout
    changes the plan, never the result (plan property pinned in
    tests/test_plans.py)."""
    from pyspark.sql import functions as F

    from betl_spark.io.writers import write_bucketed
    from betl_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    write_bucketed(
        docs.filter(F.col("doc_id") < REF_CUTOFF).select(
            "doc_id", dedup.content_hash(["text"]).alias("content_hash")
        ),
        "dedup_ref_bucketed",
        ["content_hash"],
        8,
        sort_cols=["content_hash"],
    )
    batch = (
        docs.filter(F.col("doc_id") < 50)
        .select((F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") >= REF_CUTOFF).select("doc_id", "text")
        )
    )
    return dedup.exact_dedup_against(
        batch,
        spark.table("dedup_ref_bucketed"),
        "doc_id",
        ["text"],
        ref_hash_col="content_hash",
    )


# storage layout never changes the answer — the oracle is identical to
# the non-bucketed variant's
DEDUP_BLOOM_BUCKETED_SQL = DEDUP_BLOOM_INCREMENTAL_SQL


QUERIES = {
    "dedup_bloom_bucketed": (q_dedup_bloom_bucketed, DEDUP_BLOOM_BUCKETED_SQL),
    "semantic_dedup_2level": (
        q_semantic_dedup_2level,
        SEMANTIC_DEDUP_2LEVEL_SQL,
    ),
    "semantic_dedup_medoid": (
        q_semantic_dedup_medoid,
        SEMANTIC_DEDUP_MEDOID_SQL,
    ),
}
