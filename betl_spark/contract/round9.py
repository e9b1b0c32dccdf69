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
