"""Round-6 contract queries: semantic dedup (SemDeDup composition) and
tokenizer-faithful BPE token counting.

Same determinism rules as the rest of the contract: cosine and centroid
values round to 6dp before any comparison, survivor choice is the
minimum id (a total order), and the oracle replays the identical
md5-free arithmetic in DuckDB.
"""

from __future__ import annotations

from betl_spark.contract.common import table
from betl_spark.contract.scale import (
    EMB_DIM,
    IVF_CENTROID_IDS,
    _CELL_COS,
    _COSINE_PAIR,
)

SEMANTIC_THRESHOLD = 0.3


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup composition: k-means cells -> within-cell cosine pairs
    -> star connected components -> minimum-id survivors."""
    from betl_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, "vec_id", "embedding", IVF_CENTROID_IDS,
        threshold=SEMANTIC_THRESHOLD,
    )


_COS_E_CV = """
round(
  list_sum(list_transform(list_zip(e.embedding, c.cv),
           p -> CAST(struct_extract(p, 1) AS DOUBLE) * struct_extract(p, 2)))
  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(c.cv, x -> x * x)))),
  6)
"""

SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE cent AS (
  SELECT vec_id AS cell_id, embedding FROM embeddings
  WHERE vec_id IN ({", ".join(str(i) for i in IVF_CENTROID_IDS)})
),
assign0 AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY {_CELL_COS} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN cent c
),
cell0 AS (SELECT vec_id, embedding, cell_id FROM assign0 WHERE cell_rank = 1),
expl AS (
  SELECT cell_id, CAST(r.range AS INTEGER) AS pos,
         CAST(embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE) AS val
  FROM cell0 CROSS JOIN range({EMB_DIM}) r
),
trained AS (
  SELECT cell_id, pos, round(avg(val), 6) AS cval
  FROM expl GROUP BY cell_id, pos
),
tcent AS (
  SELECT cell_id, list(cval ORDER BY pos) AS cv FROM trained GROUP BY cell_id
),
assign1 AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY {_COS_E_CV} DESC, c.cell_id
         ) AS cell_rank
  FROM embeddings e CROSS JOIN tcent c
),
corpus AS (SELECT vec_id, embedding, cell_id FROM assign1 WHERE cell_rank = 1),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM corpus a JOIN corpus b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE {_COSINE_PAIR} >= {SEMANTIC_THRESHOLD}
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
),
clusters AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node)
SELECT c.vec_id, c.cell_id
FROM corpus c LEFT JOIN clusters cl ON c.vec_id = cl.node
WHERE cl.cluster_id IS NULL OR c.vec_id = cl.cluster_id
"""


QUERIES = {
    "semantic_dedup": (q_semantic_dedup, SEMANTIC_DEDUP_SQL),
}
