"""Schema registry: layers → datasets → tables → columns.

The reference declares schemas externally (Google-Sheets workbooks cached
as dict-literal text files, betl/admin.py:448-472, re-read at
betl/datamodel/DataLayerClass.py:60-84). Here the registry is the same
nested-dict model persisted as JSON, materialized to Spark ``StructType``
with column metadata.

Key reference semantics reproduced:

- table type from name prefix ``dm_`` / ``ft_`` / ``su_`` →
  DIMENSION / FACT / SUMMARY (betl/datamodel/TableClass.py:115-132);
- audit columns auto-appended to every non-FACT table except dm_audit
  (betl/datamodel/TableClass.py:91-98);
- an ``fk_audit`` FK column auto-appended to every FACT table
  (betl/datamodel/TableClass.py:64-79);
- column roles: Surrogate key / Natural key / Foreign key / Attribute
  with optional fkDimension (betl/datamodel/ColumnClass.py:1-24);
- staging reads are ALL-STRING with '' for missing, never null
  (betl/io/fileIO.py:26-51) → ``all_string_schema``;
- table-name sanitization (betl/admin.py:797-804) → ``clean_table_name``;
- declared dataType strings map to real Spark types only at the
  warehouse edge (betl/datamodel/ColumnClass.py:26-35).

Indexes and FK constraints from the reference's DDL
(betl/datamodel/ColumnClass.py:50-92) have no Spark equivalent and are
deliberately absent (SURVEY.md §1.3).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from betl_spark.config import AUDIT_COLS, AUDIT_COL_NAMES, DATA_LAYERS

SK_PREFIX = "sk_"
NK_PREFIX = "nk_"
FK_PREFIX = "fk_"

# Declared dataType → Spark type (reference pastes these strings into
# Postgres DDL verbatim, ColumnClass.py:26-35; we map to Catalyst types).
_TYPE_MAP: dict[str, T.DataType] = {
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "SERIAL": T.LongType(),
    "NUMERIC": T.DecimalType(18, 2),
    "DECIMAL": T.DecimalType(18, 2),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "REAL": T.DoubleType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOLEAN": T.BooleanType(),
    "BINARY": T.BinaryType(),
}


def spark_type_for(data_type: str) -> T.DataType:
    base = re.sub(r"\(.*\)", "", (data_type or "TEXT")).strip().upper()
    m = re.match(r"(NUMERIC|DECIMAL)\s*\((\d+)\s*,\s*(\d+)\)", (data_type or "").upper())
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3)))
    return _TYPE_MAP.get(base, T.StringType())


def clean_table_name(name: str) -> str:
    """Sanitize a source table name (reference betl/admin.py:797-804)."""
    n = name.lower()
    for ch in "()-":
        n = n.replace(ch, "")
    return n.replace(" ", "_")


def all_string_schema(column_names: list[str]) -> T.StructType:
    """All-text staging schema (reference betl/io/fileIO.py:26-37)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in column_names])


@dataclass
class Column:
    name: str
    data_type: str = "TEXT"
    column_type: str = "Attribute"  # Surrogate key | Natural key | Foreign key | Attribute
    fk_dimension: str | None = None

    @property
    def is_sk(self) -> bool:
        return self.column_type == "Surrogate key"

    @property
    def is_nk(self) -> bool:
        return self.column_type == "Natural key"

    @property
    def is_fk(self) -> bool:
        return self.column_type == "Foreign key"

    @property
    def is_audit(self) -> bool:
        return self.name in AUDIT_COL_NAMES

    def to_struct_field(self) -> T.StructField:
        meta = {"columnType": self.column_type}
        if self.fk_dimension:
            meta["fkDimension"] = self.fk_dimension
        return T.StructField(self.name, spark_type_for(self.data_type), True, metadata=meta)


@dataclass
class Table:
    name: str
    columns: list[Column] = field(default_factory=list)
    src_table_name: str | None = None  # original source name (TableClass.py:20-32)

    def __post_init__(self) -> None:
        self.name = clean_table_name(self.name)
        if self.src_table_name is None:
            self.src_table_name = self.name
        self._apply_auto_columns()

    @property
    def table_type(self) -> str:
        # Prefix convention (reference betl/datamodel/TableClass.py:115-132).
        if self.name.startswith("dm_"):
            return "DIMENSION"
        if self.name.startswith("ft_"):
            return "FACT"
        if self.name.startswith("su_"):
            return "SUMMARY"
        return "TABLE"

    def _apply_auto_columns(self) -> None:
        names = {c.name for c in self.columns}
        if self.table_type == "FACT" and "fk_audit" not in names:
            # fk_audit auto-append (TableClass.py:64-79)
            self.columns.append(
                Column("fk_audit", "INTEGER", "Foreign key", fk_dimension="dm_audit")
            )
        elif self.table_type in ("DIMENSION", "SUMMARY", "TABLE") and self.name != "dm_audit":
            # audit cols auto-append to non-FACT tables (TableClass.py:91-98)
            for ac in AUDIT_COLS:
                if ac["columnName"] not in names:
                    self.columns.append(Column(ac["columnName"], ac["dataType"], "Attribute"))

    @property
    def col_names(self) -> list[str]:
        return [c.name for c in self.columns]

    @property
    def sk_col(self) -> Column | None:
        return next((c for c in self.columns if c.is_sk), None)

    @property
    def nk_cols(self) -> list[Column]:
        return [c for c in self.columns if c.is_nk]

    @property
    def fk_cols(self) -> list[Column]:
        return [c for c in self.columns if c.is_fk]

    def to_struct_type(self, all_string: bool = False) -> T.StructType:
        if all_string:
            return all_string_schema(self.col_names)
        return T.StructType([c.to_struct_field() for c in self.columns])

    def ordered_write_columns(self, incoming: list[str]) -> list[str]:
        """Validate + reorder columns for a write (dfl_io.py:106-160).

        Every incoming column must exist in the logical model; output is
        schema order, tolerating absence of SK and audit columns in the
        incoming dataset.
        """
        legal = set(self.col_names)
        unknown = [c for c in incoming if c not in legal]
        if unknown:
            raise ValueError(
                f"columns not in logical schema of {self.name}: {sorted(unknown)}; "
                f"schema has {sorted(legal)}"
            )
        have = set(incoming)
        out = []
        for c in self.columns:
            if c.name in have:
                out.append(c.name)
            elif not (c.is_sk or c.is_audit):
                raise ValueError(f"write to {self.name} missing required column {c.name!r}")
        return out


class SchemaRegistry:
    """Nested layer → dataset → table registry, JSON-persisted.

    The LOD layer deliberately has no declared schema — it is a free-form
    staging handoff area (reference DataLayerClass.py:73-77): reads and
    writes there skip validation.
    """

    def __init__(self) -> None:
        self._layers: dict[str, dict[str, dict[str, Table]]] = {
            layer: {} for layer in DATA_LAYERS
        }

    def add_table(self, layer: str, table: Table, dataset: str = "default") -> Table:
        layer = layer.upper()
        if layer == "LOD":
            raise ValueError("LOD layer is schema-free (reference DataLayerClass.py:73-77)")
        self._layers[layer].setdefault(dataset, {})[table.name] = table
        return table

    def define(
        self,
        layer: str,
        table_name: str,
        columns: list[tuple | dict | Column],
        dataset: str = "default",
    ) -> Table:
        cols = []
        for c in columns:
            if isinstance(c, Column):
                cols.append(c)
            elif isinstance(c, dict):
                cols.append(
                    Column(
                        c["columnName"],
                        c.get("dataType", "TEXT"),
                        c.get("columnType", "Attribute"),
                        c.get("fkDimension"),
                    )
                )
            else:
                cols.append(Column(*c))
        return self.add_table(layer, Table(table_name, cols), dataset)

    def get_table(self, layer: str, table_name: str) -> Table | None:
        layer = layer.upper()
        table_name = clean_table_name(table_name)
        for ds in self._layers.get(layer, {}).values():
            if table_name in ds:
                return ds[table_name]
        return None

    def tables(self, layer: str, table_type: str | None = None) -> list[Table]:
        out: list[Table] = []
        for ds in self._layers[layer.upper()].values():
            for t in ds.values():
                if table_type is None or t.table_type == table_type:
                    out.append(t)
        return sorted(out, key=lambda t: t.name)

    # -- persistence (reference caches schema descs as text files,
    #    betl/admin.py:470-472; JSON here) --
    def save(self, path: str) -> None:
        doc = {
            layer: {
                ds: {
                    name: {
                        "srcTableName": t.src_table_name,
                        "columns": [
                            {
                                "columnName": c.name,
                                "dataType": c.data_type,
                                "columnType": c.column_type,
                                "fkDimension": c.fk_dimension,
                            }
                            for c in t.columns
                        ],
                    }
                    for name, t in tables.items()
                }
                for ds, tables in self._layers[layer].items()
            }
            for layer in self._layers
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)

    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        reg = cls()
        with open(path) as f:
            doc = json.load(f)
        for layer, datasets in doc.items():
            for ds, tables in datasets.items():
                for name, spec in tables.items():
                    cols = [
                        Column(
                            c["columnName"],
                            c.get("dataType", "TEXT"),
                            c.get("columnType", "Attribute"),
                            c.get("fkDimension"),
                        )
                        for c in spec["columns"]
                    ]
                    t = Table(name, cols, src_table_name=spec.get("srcTableName"))
                    reg._layers[layer].setdefault(ds, {})[t.name] = t
        return reg
