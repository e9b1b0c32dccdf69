"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``betl_spark.contract`` — each drives a SURVEY.md
§2 operator family (or a beyond-reference scale operator) through the
engine's public surface, paired with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-style Q5 (6-table star join + decimal-exact
    revenue aggregation) on /root/testdata/sf0.001."""
    from betl_spark.contract import QUERIES

    return QUERIES["tpch_q5_local_supplier"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from betl_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from betl_spark.contract import ORACLES

    return dict(ORACLES)
