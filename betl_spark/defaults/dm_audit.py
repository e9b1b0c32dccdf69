"""Generated audit dimension (reference betl/defaultdataflows/dmAudit.py).

The cartesian product of the 4 load operations × data-quality scores
0-9 (dmAudit.py:41-69; schema :1-38), built with a native ``crossJoin``
instead of the reference's constant-key outer-join trick. The NK is the
'_'-joined (source_system, bulk_load_date, delta_load_date, operation)
string that ``collapse_audit_cols_to_nk`` produces on facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LOAD_OPS = ["BULK", "DELTA", "MANUAL", "DEFAULT"]


def audit_dimension(spark: SparkSession) -> DataFrame:
    ops = spark.createDataFrame([(o,) for o in LOAD_OPS], ["load_operation"])
    scores = spark.createDataFrame([(i,) for i in range(10)], ["data_quality_score"])
    return ops.crossJoin(scores).select("load_operation", "data_quality_score")


def transform_dm_audit(pipeline) -> None:
    dfl = pipeline.dataflow("transformDMAudit")
    dfl.createDataset("dm_audit", audit_dimension(pipeline.spark))
    dfl.prepForLoad("dm_audit")
