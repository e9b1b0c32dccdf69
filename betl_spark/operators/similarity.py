"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``       — brute-force exact top-k: the correctness
  baseline. Query set broadcast against the corpus; one pass, partial
  top-k per partition via window-free rank on the joined result.
- ``lsh_bucket_topk``   — random-hyperplane LSH: corpus bucketed once by
  sign pattern; queries only score their own bucket. The scale path:
  at 100 TB the scored candidate set shrinks by ~2^n_planes.

Hyperplanes are md5-derived (plane i, dim j → deterministic ±1), so
bucketing is reproducible across runs/engines with no stored model.

Cosine is computed in double with a sequential fold (zip_with +
aggregate) and rounded to 6dp — the rounding makes rank cuts stable
across engines whose float summation might differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> F.Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k by
    (sim desc, neighbor_id) — a total order, so results are unique.

    The query side is tiny → broadcast; the corpus is scanned once.
    """
    queries = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.2,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ threshold. The all-pairs self-join is the correctness
    baseline; at scale, pre-bucket with ``hyperplane_signs`` and join on
    the bucket (same shape as ``lsh_bucket_topk``) so candidate pairs
    shrink by ~2^n_planes before the exact cosine runs.

    Beyond-reference scale operator (the reference has only exact
    row dedup, betl/dataflow/dfl_changeRow.py:23-34)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def hyperplane_signs(vec_col, n_planes: int, dim: int) -> F.Column:
    """LSH bucket id: sign bits of dot(vec, plane_i) for md5-derived
    ±1 hyperplanes. Returns an int bucket in [0, 2^n_planes)."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        terms = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[_plane_component(i, j) for j in range(dim)]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(terms > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _plane_component(plane: int, dim_idx: int) -> F.Column:
    """Deterministic ±1 from md5(plane:dim) parity."""
    h = F.conv(F.substring(F.md5(F.lit(f"{plane}:{dim_idx}")), 1, 2), 16, 10).cast("int")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. Same output shape as ``cosine_topk`` (rank within bucket).

    Recall < 1.0 by construction; the bucketed join shuffles on the
    bucket id, giving ~|corpus|/2^n_planes candidates per query.
    """
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signs(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    corpus = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
