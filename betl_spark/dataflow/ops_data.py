"""Cell-value operators: setNulls, toNumeric, replace
(reference betl/dataflow/dfl_changeData.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F


class DataOps:
    def setNulls(
        self,
        dataset: str,
        columns: dict[str, Any],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Fill NULLs per column with a given value
        (reference betl/dataflow/dfl_changeData.py:1-11).

        Staging data is all-string with '' for missing, so '' is treated
        as null here too — that is the reference's intent (its isnull()
        check runs before staging CSVs introduce the '' convention).
        """
        with self.journal.step("setNulls", desc or f"setNulls {dataset}"):
            df = self._get(dataset)
            for col, val in columns.items():
                is_string = dict(df.dtypes).get(col) == "string"
                cond = F.col(col).isNull()
                if is_string:
                    cond = cond | (F.col(col) == "")
                df = df.withColumn(col, F.when(cond, F.lit(val)).otherwise(F.col(col)))
            self.data[targetDataset or dataset] = df
        return df

    def toNumeric(
        self,
        dataset: str,
        columns: str | list[str],
        targetColumns: str | list[str] | None = None,
        castTo: str = "Int64",
        cleanedValues: dict | None = None,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Strip non-numeric characters and cast
        (reference betl/dataflow/dfl_changeData.py:14-64: regex
        ``[^\\d.]+`` then astype).

        castTo ∈ {'int' (nulls→0), 'Int64' (nullable), 'double'}.
        DEVIATION (SURVEY §2.14.3): the reference's 'int' branch
        accidentally falls through to an error; the documented intent is
        implemented.
        """
        with self.journal.step("toNumeric", desc or f"toNumeric {dataset}"):
            df = self._get(dataset)
            cols = [columns] if isinstance(columns, str) else list(columns)
            if targetColumns is None:
                targets = cols
            else:
                targets = [targetColumns] if isinstance(targetColumns, str) else list(targetColumns)
            for src, tgt in zip(cols, targets):
                cleaned = F.regexp_replace(F.col(src).cast("string"), r"[^\d.]+", "")
                cleaned = F.when(cleaned == "", None).otherwise(cleaned)
                if castTo in ("int", "Int64", "long"):
                    val = cleaned.cast("long")
                    if castTo == "int":
                        val = F.coalesce(val, F.lit(0))
                elif castTo in ("double", "float"):
                    val = cleaned.cast("double")
                else:
                    raise ValueError(f"unsupported castTo {castTo!r}")
                df = df.withColumn(tgt, val)
            self.data[targetDataset or dataset] = df
        return df

    def replace(
        self,
        dataset: str,
        toReplace: Any,
        value: Any,
        columns: str | list[str] | None = None,
        regex: bool = False,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Value or regex replace on chosen columns or the whole dataset
        (reference betl/dataflow/dfl_changeData.py:67-102 pd.replace)."""
        with self.journal.step("replace", desc or f"replace in {dataset}"):
            df = self._get(dataset)
            if columns is None:
                cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
            else:
                cols = [columns] if isinstance(columns, str) else list(columns)
            for col in cols:
                if regex:
                    df = df.withColumn(
                        col, F.regexp_replace(F.col(col), str(toReplace), str(value))
                    )
                else:
                    df = df.withColumn(
                        col,
                        F.when(F.col(col) == toReplace, F.lit(value)).otherwise(F.col(col)),
                    )
            self.data[targetDataset or dataset] = df
        return df
