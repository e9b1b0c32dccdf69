"""ANN recall@10 ladder: seed-row centroids vs k-means-trained.

Round-8 verdict ask: `kmeans_update` existed (green) but the IVF
contract path always probed seed-row centroids; measure the recall
lift from composing the trainer in. This script measures recall@10
against the exact brute-force baseline (`cosine_topk`) at sf0.1 for:

- seed-row centroids (the contract's 8 ids) at nprobe 1/2/4,
- `kmeans_train` (2 and 4 rounds) from the same seeds at nprobe 1/2/4,
- a wider trained model (k=32 cells, seeds = every 40th vec_id) at
  nprobe 1/2/4/8 — the "k ∝ n, constant candidate fraction" shape
  SCALE.md prescribes for 100 TB.

Run: PYTHONPATH=/root/repo python scripts/ann_recall.py [sf_dir]
Prints one JSON line; paste the numbers into SCALE.md's recall section.
"""

import json
import sys

from pyspark.sql import functions as F

from betl_spark.operators import similarity
from betl_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES, K = 50, 10
SEED_IDS = [100, 200, 300, 400, 500, 600, 700, 800]


def recall_at_k(approx, exact_sets) -> float:
    got = {}
    for r in approx.select("query_id", "neighbor_id").collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return round(
        sum(
            len(got.get(q, set()) & exact_sets[q]) / len(exact_sets[q])
            for q in exact_sets
        )
        / len(exact_sets),
        3,
    )


def main():
    spark = build_spark()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(N_QUERIES))

    exact = similarity.cosine_topk(emb, "vec_id", "embedding", qids, k=K)
    exact_sets = {}
    for r in exact.select("query_id", "neighbor_id").collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    out = {"sf_dir": SF_DIR, "n_queries": N_QUERIES, "k": K, "ivf": {}}

    models = {"seed8": similarity._seed_cents(emb, "vec_id", "embedding", SEED_IDS)}
    for iters in (2, 4):
        models[f"trained8_it{iters}"] = similarity.kmeans_train(
            emb, "vec_id", "embedding", SEED_IDS, iterations=iters
        )
    n_vecs = emb.count()
    wide_seeds = [i * 40 for i in range(32) if i * 40 < n_vecs]
    models["trained32_it4"] = similarity.kmeans_train(
        emb, "vec_id", "embedding", wide_seeds, iterations=4
    )

    for name, cents in models.items():
        cents = cents.localCheckpoint(eager=True)  # train once per model
        ladder = (1, 2, 4, 8) if "32" in name else (1, 2, 4)
        out["ivf"][name] = {
            f"nprobe{np}": recall_at_k(
                similarity.ivf_topk_model(
                    emb, "vec_id", "embedding", qids, cents, k=K, nprobe=np
                ),
                exact_sets,
            )
            for np in ladder
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
