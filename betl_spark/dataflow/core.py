"""The DataFlow class — the engine's user-facing query API.

The reference composes DataFlow from 10 operator modules
(betl/dataflow/DataFlowClass.py:4-46); here the same vocabulary is mixin
classes over a dict of *lazy* DataFrames. Where the reference executes
each step eagerly in pandas and logs the resulting shape
(DataFlowClass.py:68-103), every operator here just extends a Catalyst
plan; the single Spark action happens at ``write`` (or when app code
collects). Step metadata goes to a journal; shape capture is opt-in.

Typical usage (mirrors reference betl/betl-test/test_app/dfl_example.py):

    dfl = DataFlow(conf, "clean customers")
    dfl.read("customers", "EXT")
    dfl.dedupe("customers")
    dfl.filter("customers", {"status": "active"})
    dfl.write("customers", "customers_clean", "TRN")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from betl_spark.config import Conf
from betl_spark.dataflow.journal import Journal
from betl_spark.dataflow.load_prep import LoadPrepOps
from betl_spark.dataflow.mdm import MDMOps
from betl_spark.dataflow.ops_custom import CustomOps
from betl_spark.dataflow.ops_data import DataOps
from betl_spark.dataflow.ops_io import IOOps
from betl_spark.dataflow.ops_analytics import AnalyticsOps
from betl_spark.dataflow.ops_merge import MergeOps
from betl_spark.dataflow.ops_row import RowOps
from betl_spark.dataflow.ops_scale import ScaleOps
from betl_spark.dataflow.ops_schema import SchemaOps
from betl_spark.schema.registry import SchemaRegistry
from betl_spark.session import build_spark


class DataFlow(
    IOOps, RowOps, SchemaOps, DataOps, MergeOps, CustomOps, LoadPrepOps, MDMOps,
    ScaleOps, AnalyticsOps,
):
    def __init__(
        self,
        conf: Conf | None = None,
        desc: str = "",
        spark: SparkSession | None = None,
        registry: SchemaRegistry | None = None,
    ):
        self.conf = conf or Conf()
        self.spark = spark or build_spark()
        self.registry = registry
        self.desc = desc
        self.data: dict[str, DataFrame] = {}
        self.journal = Journal(desc)
        self.closed = False

    def _get(self, dataset: str) -> DataFrame:
        if dataset not in self.data:
            raise KeyError(
                f"dataset {dataset!r} not in dataflow; have {sorted(self.data)}"
            )
        return self.data[dataset]

    def close(self) -> None:
        """End-of-dataflow cleanup (reference DataFlowClass.py:105-115):
        unpersist anything cached and release references."""
        for df in self.data.values():
            try:
                if df.is_cached:
                    df.unpersist()
            except Exception:
                pass
        self.data.clear()
        self.closed = True
