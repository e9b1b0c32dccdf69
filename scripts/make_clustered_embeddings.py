#!/usr/bin/env python
"""Clustered-embedding testdata for the ANN recall ladder (round-10
verdict ask #7).

The synthetic sf testdata's embeddings are ISOTROPIC (measured mean
|cos| ≈ 0.10 at sf1), which caps IVF recall structurally: with no
density structure, a query's true top-10 scatter across cells and
≥0.9 recall@10 needs >60% scan (SCALE.md round-10 analysis). Real
corpora are clustered — text/image embeddings concentrate on semantic
manifolds — and the trained-IVF plan's claimed 0.9+ low-probe
operating points assume that structure. This script manufactures it
deterministically so the claim is MEASURED, not argued:

- 200 unit-norm Gaussian cluster centers in d=64 (seeded numpy);
- 50k vectors: center[i % 200] + N(0, 0.0625²) per-dim noise
  (within-cluster cosine ≈ 0.92, cross-cluster ≈ 0.12 — the shape of
  a well-trained sentence-embedding space);
- vec_id i gets cluster i % 200, so the ladder's 50 query ids land in
  50 DISTINCT clusters (no easy-case bias);
- label = cluster id, for occupancy/purity diagnostics.

Output: .scale/sf1_clustered/embeddings.parquet (~13 MB). Re-run the
ladder with:
    PYTHONPATH=/root/repo python scripts/ann_recall_sf1.py \
        /root/repo/.scale/sf1_clustered
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "sf1_clustered",
)
N, D, C, SIGMA, SEED = 50_000, 64, 200, 0.0625, 7


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((C, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N) % C
    vecs = centers[labels] + rng.normal(0.0, SIGMA, (N, D))

    # diagnostics: within/cross cluster cosine on a sample
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    same = np.mean(np.sum(vn[:C] * vn[C : 2 * C], axis=1))  # i vs i+C: same cluster
    cross = np.mean(np.abs(vn[:1000:2] @ vn[1:1000:2].T))
    print(f"within-cluster cos ≈ {same:.3f}, mean |cross cos| ≈ {cross:.3f}")

    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    path = os.path.join(OUT_DIR, "embeddings.parquet")
    pq.write_table(table, path)
    print(f"wrote {path}: {N} x {D}, {C} clusters, {os.path.getsize(path)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
