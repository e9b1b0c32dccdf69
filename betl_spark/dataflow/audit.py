"""Audit-column stamping (reference betl/dataflow/dfl_audit.py).

Four framework columns ride along on every extracted dataset
(betl/ConfClass.py:33-46), stamped at extract time
(dfl_audit.py:4-16) and later collapsed into a single audit natural key
on facts (dfl_audit.py:19-37).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, functions as F

from betl_spark.config import AUDIT_COL_NAMES


def set_audit_cols(
    df: DataFrame,
    src_sys_id: str,
    bulk_or_delta: str = "BULK",
    load_date: datetime.date | None = None,
) -> DataFrame:
    """Stamp the 4 audit columns (reference dfl_audit.py:4-16).

    Staging is all-string, so dates are ISO strings here; they become
    DATE at the warehouse boundary.
    """
    d = (load_date or datetime.date.today()).isoformat()
    if bulk_or_delta.upper() == "BULK":
        return (
            df.withColumn("audit_source_system", F.lit(src_sys_id))
            .withColumn("audit_bulk_load_date", F.lit(d))
            .withColumn("audit_latest_delta_load_date", F.lit(""))
            .withColumn("audit_latest_load_operation", F.lit("BULK"))
        )
    return (
        df.withColumn("audit_source_system", F.lit(src_sys_id))
        .withColumn("audit_latest_delta_load_date", F.lit(d))
        .withColumn("audit_latest_load_operation", F.lit("DELTA"))
    )


def collapse_audit_cols_to_nk(df: DataFrame) -> DataFrame:
    """Replace the audit columns with one ``nk_audit`` natural key
    (reference dfl_audit.py:19-37): '_'-joined audit values, used to
    resolve ``fk_audit`` against dm_audit at fact-load time."""
    present = [c for c in AUDIT_COL_NAMES if c in df.columns]
    out = df.withColumn(
        "nk_audit", F.concat_ws("_", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in present])
    )
    return out.drop(*present)
