"""Default bulk extract (reference betl/defaultdataflows/stageExtract.py:13-39).

Per source-system table: read from the source datastore, stamp audit
columns, write to EXT. Delta extract (NK-keyed change classification) is
specified-but-unimplemented in the reference
(stageExtract.py:41-228 commented code); see ``betl_spark.defaults.delta``
for the Spark implementation of that spec.
"""

from __future__ import annotations


def bulk_extract(pipeline, src_sys_id: str, bulk_or_delta: str = "BULK") -> None:
    store = pipeline.conf.datastores[src_sys_id]
    tables = pipeline.registry.tables("EXT") or []
    for table in tables:
        dfl = pipeline.dataflow(f"bulkExtract {src_sys_id}.{table.name}")
        dfl.getDataFromSrc(
            table.name,
            src_sys_id,
            bulkOrDelta=bulk_or_delta,
            srcTableName=table.src_table_name,
        )
        dfl.write(table.name, table.name, "EXT")
