from betl_spark.schema.registry import (
    Column,
    Table,
    SchemaRegistry,
    all_string_schema,
    spark_type_for,
    clean_table_name,
)

__all__ = [
    "Column",
    "Table",
    "SchemaRegistry",
    "all_string_schema",
    "spark_type_for",
    "clean_table_name",
]
