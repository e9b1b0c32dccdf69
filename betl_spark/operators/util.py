"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions
    (default ``sparkContext.defaultParallelism``) — but ONLY when the
    input has fewer.

    Input splits bound operator parallelism: a small parquet file is
    one row group = one partition, so a CPU-heavy per-row operator
    (n-gram construction, shingle/minhash folds) downstream of it runs
    on ONE core no matter how many the cluster has — file-split sizing
    (``spark.sql.files.maxPartitionBytes``) can't subdivide a row
    group. At real scale the predicate is false (a 100 TB input has
    thousands of splits) and this is a plan NO-OP — big inputs never
    pay the exchange; small inputs trade one tiny shuffle for
    cluster-wide parallelism on the expensive map work.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
