"""Semi-structured (JSON) shredding: schema-on-read extraction of
typed fields from JSON string columns — the event-properties pattern
(every tracking pipeline carries a `props` JSON blob next to the typed
columns).

Scale shape: ``from_json`` with an EXPLICIT schema is one codegen
projection — no shuffle, no Python, and crucially no schema-inference
pre-scan (``spark.read.json`` without a schema reads the data twice;
at 100 TB the inference pass alone is the whole job). Extraction
happens before any aggregation, so only the shredded (narrow) columns
cross the wire. Malformed documents surface as a NULL struct rather
than a job abort (PERMISSIVE mode) — quarantine them with the
``parse_ok`` flag instead of losing the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shred_json(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    keep_cols: list[str] | None = None,
    flag_col: str = "parse_ok",
) -> DataFrame:
    """Extract typed fields from a JSON string column: one output
    column per ``fields`` entry (name → Spark DDL type, e.g.
    ``{"k": "bigint", "tag": "string"}``), plus ``flag_col`` marking
    rows whose JSON parsed (a missing FIELD is a NULL value with
    ``parse_ok`` true; a broken or NULL DOCUMENT is all-NULL with
    ``parse_ok`` false — the two failure modes need different upstream
    fixes).

    Malformed-document detection uses PERMISSIVE mode's corrupt-record
    column (``from_json`` returns an all-null struct for bad input —
    indistinguishable from a document whose fields are merely absent —
    so the corrupt column is the only reliable flag).
    """
    corrupt = "__corrupt"
    while corrupt in fields:
        corrupt += "_"
    ddl = ", ".join(
        [f"`{name}` {typ}" for name, typ in fields.items()]
        + [f"`{corrupt}` string"]
    )
    parsed = F.from_json(
        F.col(json_col), ddl, {"columnNameOfCorruptRecord": corrupt}
    )
    return df.select(
        *(keep_cols or df.columns),
        *[parsed[name].alias(name) for name in fields],
        (
            F.col(json_col).isNotNull() & parsed[corrupt].isNull()
        ).alias(flag_col),
    )
