"""Schema-shape operators: renameColumns, dropColumns, addColumns,
pivotColsToRows (reference betl/dataflow/dfl_changeSchema.py).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column as SparkCol, DataFrame, functions as F, types as T

from betl_spark.config import AUDIT_COL_NAMES


def _add_positional_column(df: DataFrame, name: str, values: list) -> DataFrame:
    """Attach a list as a column by row position (the reference assigns a
    pandas array positionally, dfl_changeSchema.py:72-75).

    Positional semantics only exist relative to the current plan's row
    order, so this is inherently order-dependent — fine for the
    reference's use (small lookup/config frames), wrong for big
    distributed data; ``zipWithIndex`` keeps partition order stable for a
    deterministic input plan.
    """
    spark = df.sparkSession
    indexed = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1]))
    left = spark.createDataFrame(indexed, df.schema.add("__pos__", T.LongType()))
    right = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], schema=["__pos__", name]
    )
    return (
        left.join(F.broadcast(right), "__pos__", "left")
        .orderBy("__pos__")
        .drop("__pos__")
    )


class SchemaOps:
    def renameColumns(
        self,
        dataset: str,
        columns: dict[str, str],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Rename columns from a mapping
        (reference betl/dataflow/dfl_changeSchema.py:4-18)."""
        with self.journal.step("renameColumns", desc or f"rename {dataset}"):
            out = self._get(dataset).withColumnsRenamed(columns)
            self.data[targetDataset or dataset] = out
        return out

    def dropColumns(
        self,
        dataset: str,
        colsToDrop: list[str] | None = None,
        colsToKeep: list[str] | None = None,
        dropAuditCols: bool = False,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Drop by list, keep by list (audit cols silently retained), or
        drop the audit cols (reference dfl_changeSchema.py:21-63,
        colsToKeep audit retention at :41-45)."""
        with self.journal.step("dropColumns", desc or f"dropColumns {dataset}"):
            df = self._get(dataset)
            if colsToDrop is not None and colsToKeep is not None:
                raise ValueError("specify colsToDrop or colsToKeep, not both")
            if colsToKeep is not None:
                keep = list(colsToKeep) + [
                    c for c in AUDIT_COL_NAMES if c in df.columns and c not in colsToKeep
                ]
                out = df.select([c for c in df.columns if c in set(keep)])
            elif colsToDrop is not None:
                out = df.drop(*colsToDrop)
            elif dropAuditCols:
                out = df.drop(*[c for c in AUDIT_COL_NAMES if c in df.columns])
            else:
                raise ValueError("nothing to drop")
            self.data[targetDataset or dataset] = out
        return out

    def addColumns(
        self,
        dataset: str,
        columns: dict[str, Any],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Add columns from a dict of col → scalar | Spark Column |
        callable(row) (reference betl/dataflow/dfl_changeSchema.py:66-87).

        The reference's per-row callable (``df.apply(f, axis=1)``)
        becomes a Python UDF over a struct of the current row — the slow
        path by design; prefer passing a Spark Column expression.
        """
        with self.journal.step("addColumns", desc or f"addColumns {dataset}"):
            df = self._get(dataset)
            for name, value in columns.items():
                if isinstance(value, SparkCol):
                    df = df.withColumn(name, value)
                elif callable(value):
                    fn = F.udf(value, T.StringType())
                    df = df.withColumn(name, fn(F.struct(*df.columns)))
                elif isinstance(value, (list, tuple)):
                    df = _add_positional_column(df, name, list(value))
                else:
                    df = df.withColumn(name, F.lit(value))
            self.data[targetDataset or dataset] = df
        return df

    def setColumns(
        self,
        dataset: str,
        columns: dict[str, Any],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Semantic alias of addColumns for overwriting existing columns
        (reference betl/dataflow/dfl_changeData.py:105-107)."""
        return self.addColumns(dataset, columns, targetDataset, desc or f"setColumns {dataset}")

    def pivotColsToRows(
        self,
        dataset: str,
        colsNotToPivot: list[str],
        colsToPivot: list[str],
        varName: str,
        valueName: str,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Unpivot/melt: id vars = colsNotToPivot + audit cols, value
        vars = colsToPivot → (varName, valueName) rows
        (reference betl/dataflow/dfl_changeSchema.py:90-127; audit cols
        kept as id_vars at :112-117). Spark-native ``unpivot`` — a
        narrow transformation, no shuffle."""
        with self.journal.step("pivotColsToRows", desc or f"unpivot {dataset}"):
            df = self._get(dataset)
            ids = list(colsNotToPivot) + [
                c
                for c in AUDIT_COL_NAMES
                if c in df.columns and c not in colsNotToPivot and c not in colsToPivot
            ]
            out = df.unpivot(ids, list(colsToPivot), varName, valueName)
            self.data[targetDataset or dataset] = out
        return out
