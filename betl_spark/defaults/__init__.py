from betl_spark.defaults.extract import bulk_extract
from betl_spark.defaults.dm_date import transform_dm_date, date_dimension
from betl_spark.defaults.dm_audit import transform_dm_audit, audit_dimension
from betl_spark.defaults.load import (
    assign_surrogate_keys,
    bulk_load_dimension,
    bulk_load_fact,
    sk_nk_map,
)
from betl_spark.defaults.summarise import default_summarise_prep

__all__ = [
    "bulk_extract",
    "transform_dm_date",
    "date_dimension",
    "transform_dm_audit",
    "audit_dimension",
    "assign_surrogate_keys",
    "bulk_load_dimension",
    "bulk_load_fact",
    "sk_nk_map",
    "default_summarise_prep",
]
