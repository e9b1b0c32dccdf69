"""ANN recall@10 at sf1 with k ∝ √n cells — the round-9 verdict's
ask #6: extend the trained-IVF ladder to the 100×-scale operating
point and publish recall PER PROBE COST (measured candidate fraction,
not the nominal nprobe/k).

At sf1 the embedding table is ~50k vectors, so k = ⌊√n⌋ cells keeps
the per-cell candidate list ~√n — the classic IVF sizing that holds
candidate fraction ≈ nprobe/√n as n grows. For each (model, nprobe)
rung this script reports:

- recall@10 vs the exact brute-force baseline (`cosine_topk`),
- the MEASURED mean candidate fraction (sum of probed-cell sizes /
  n, averaged over queries) — the real scan cost of the rung,
- recall / fraction ("lift over random"): a random scan of fraction f
  expects recall ≈ f on an isotropic corpus, so lift > 1 is what
  centroid placement actually buys.

Also prints the corpus isotropy stat (mean |cos| over sampled pairs)
that SCALE.md's recall-cap analysis rests on.

Run: PYTHONPATH=/root/repo python scripts/ann_recall_sf1.py [sf_dir]
(~minutes at sf1; sf_dir defaults to .scale/sf1).
"""

import json
import sys

import numpy as np

from pyspark.sql import functions as F

from betl_spark.operators import similarity
from betl_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
N_QUERIES, K = 50, 10


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
    n_vecs = emb.count()
    qids = list(range(N_QUERIES))

    exact = similarity.cosine_topk(emb, "vec_id", "embedding", qids, k=K)
    exact_sets = {}
    for r in exact.select("query_id", "neighbor_id").collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # isotropy: mean |cos| over ~2000 sampled pairs (driver-side numpy
    # on a bounded sample — diagnostic only)
    sample = np.array(
        [
            r["embedding"]
            for r in emb.where(F.col("vec_id") % 25 == 0)
            .limit(2000)
            .collect()
        ],
        dtype=np.float64,
    )
    sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    g = sn[: len(sn) // 2] @ sn[len(sn) // 2 :].T
    iso = float(np.mean(np.abs(g)))

    k_cells = int(n_vecs ** 0.5)
    stride = max(1, n_vecs // k_cells)
    seeds = [i * stride for i in range(k_cells)]

    out = {
        "sf_dir": SF_DIR,
        "n_vecs": n_vecs,
        "k_cells": k_cells,
        "n_queries": N_QUERIES,
        "k": K,
        "mean_abs_cos": round(iso, 4),
        "ladder": {},
    }

    for iters in (2, 4):
        cents = similarity.kmeans_train(
            emb, "vec_id", "embedding", seeds, iterations=iters
        ).localCheckpoint(eager=True)
        # cell occupancy under this model: same broadcast+argmax
        # assignment rule as ivf_topk_model
        from pyspark.sql import Window

        rows = emb.select(
            "vec_id", "embedding",
            similarity._norm(F.col("embedding")).alias("_nrm"),
        )
        aw = Window.partitionBy("vec_id").orderBy(
            F.desc("cell_sim"), F.asc("cell_id")
        )
        assigned = (
            rows.crossJoin(F.broadcast(cents))
            .select(
                "vec_id", "cell_id",
                similarity._cosine_pre(
                    F.col("embedding"), F.col("cv"),
                    F.col("_nrm"), F.col("cn"),
                ).alias("cell_sim"),
            )
            .withColumn("cell_rank", F.row_number().over(aw))
            .filter(F.col("cell_rank") == 1)
        )
        sizes = {
            r["cell_id"]: r["n"]
            for r in assigned.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # probe-cell choice per query: driver-side argmax over the
        # (bounded, already-broadcastable) centroid table
        crows = cents.orderBy("cell_id").collect()
        cmat = np.array([r["cv"] for r in crows], dtype=np.float64)
        cell_ids = [r["cell_id"] for r in crows]
        cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        qvecs = np.array(
            [
                r["embedding"]
                for r in emb.where(F.col("vec_id").isin(qids))
                .orderBy("vec_id")
                .collect()
            ],
            dtype=np.float64,
        )
        qn = qvecs / np.linalg.norm(qvecs, axis=1, keepdims=True)
        sims = qn @ cn.T  # (queries, cells)
        order = np.argsort(-sims, axis=1)
        model_rungs = {}
        for nprobe in (1, 2, 4, 8, 16):
            fracs = []
            for qi in range(len(qvecs)):
                probed = [cell_ids[j] for j in order[qi, :nprobe]]
                fracs.append(
                    sum(sizes.get(c, 0) for c in probed) / n_vecs
                )
            frac = float(np.mean(fracs))
            rec = recall_at_k(
                similarity.ivf_topk_model(
                    emb, "vec_id", "embedding", qids, cents,
                    k=K, nprobe=nprobe,
                ),
                exact_sets,
            )
            model_rungs[f"nprobe{nprobe}"] = {
                "recall": rec,
                "scan_fraction": round(frac, 4),
                "lift_over_random": round(rec / frac, 2) if frac else None,
            }
        out["ladder"][f"trained{k_cells}_it{iters}"] = model_rungs

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
