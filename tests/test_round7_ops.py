"""Round-7 operator tests: two-level semantic dedup, survivor policy,
and the centroid-broadcast guard."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
SEEDS = [100, 200, 300, 400, 500, 600, 700, 800]
COARSE = [100, 400, 700]


def test_semantic_dedup_centroid_guard(spark):
    from betl_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="single-level broadcast bound"):
        similarity.semantic_dedup(
            emb, "vec_id", "embedding",
            list(range(similarity.MAX_BROADCAST_CENTROIDS + 1)),
        )


def test_semantic_dedup_2level_coarse_subset_check(spark):
    from betl_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="coarse_ids"):
        similarity.semantic_dedup_2level(
            emb, "vec_id", "embedding", SEEDS, [100, 999]
        )


def test_semantic_dedup_survivor_policies_same_rate(spark):
    # the survivor flag changes WHICH row survives, never how many;
    # every cluster loses all but one member under both policies
    from betl_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    min_id = similarity.semantic_dedup(
        emb, "vec_id", "embedding", SEEDS, threshold=0.3
    ).collect()
    medoid = similarity.semantic_dedup(
        emb, "vec_id", "embedding", SEEDS, threshold=0.3,
        survivor="min_centroid_sim",
    ).collect()
    assert len(min_id) == len(medoid)
    # unpaired rows are identical under both policies; survivors of
    # real clusters may differ
    with pytest.raises(ValueError, match="survivor"):
        similarity.semantic_dedup(
            emb, "vec_id", "embedding", SEEDS, survivor="bogus"
        ).collect()


def test_semantic_dedup_medoid_picks_least_similar(spark):
    # 3 near-identical vectors form one cluster; the survivor must be
    # the one with the LOWEST cosine to the trained centroid — vector
    # 12 is tilted furthest from the cluster mean, so it survives even
    # though min_id would keep 10
    from betl_spark.operators import similarity

    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [0.99, 0.14, 0.0, 0.0]),
        (12, [0.9, 0.43, 0.0, 0.0]),
        (20, [0.0, 0.0, 1.0, 0.0]),  # lone row in a far cell
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id
        for r in similarity.semantic_dedup(
            df, "vec_id", "embedding", [10, 20], threshold=0.9,
            survivor="min_centroid_sim",
        ).collect()
    }
    assert 20 in got and len(got) == 2
    assert got - {20} == {12}
    min_id = {
        r.vec_id
        for r in similarity.semantic_dedup(
            df, "vec_id", "embedding", [10, 20], threshold=0.9
        ).collect()
    }
    assert min_id - {20} == {10}


def test_semantic_dedup_2level_has_no_all_pairs_join(spark):
    """Same plan contract as single-level semantic_dedup: the only
    non-equi joins are broadcast (the bounded coarse-model argmaxes);
    pair generation and the fine-cell resolution are real equi-joins,
    so nothing all-pairs leaks in at any level."""
    import re
    from tests.test_plans import plan
    from betl_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = similarity.semantic_dedup_2level(
        emb, "vec_id", "embedding", SEEDS, COARSE, threshold=0.3
    )
    p = plan(df)
    assert "CartesianProduct" not in p
    nlj = re.findall(r"\(\d+\) (\w*NestedLoopJoin)", p)
    assert all(j == "BroadcastNestedLoopJoin" for j in nlj)
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", p)
