from betl_spark.dataflow.core import DataFlow

__all__ = ["DataFlow"]
