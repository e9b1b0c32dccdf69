"""Shared helpers for contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from betl_spark.config import Conf
from betl_spark.dataflow.core import DataFlow

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long
        # nanos-since-epoch under this conf (runtime-settable), so set it
        # here too in case the caller's session didn't come from
        # betl_spark.session.build_spark
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dataflow(spark: SparkSession, sf_dir: str, tables: list[str], desc: str = "contract") -> DataFlow:
    """A DataFlow pre-loaded with the named testdata tables, so contract
    queries run through the engine's own operator surface."""
    import tempfile

    # throwaway app_root so side-channel outputs (alerts file, staging
    # dirs) never land in the caller's working directory
    dfl = DataFlow(Conf(app_root=tempfile.mkdtemp(prefix="betl_contract_")), desc, spark=spark)
    for t in tables:
        dfl.createDataset(t, table(spark, sf_dir, t))
    return dfl


# exact-decimal aggregation fragments (see package docstring)
def dec(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


REVENUE = f"CAST(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS DOUBLE)"
