"""Custom-code operators: customSQL, applyFunctionToColumns,
applyFunctionToRows (reference betl/dataflow/dfl_customCode.py).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


class CustomOps:
    def customSQL(
        self,
        sql: str,
        dataset: str | None = None,
        desc: str = "",
    ) -> DataFrame | None:
        """Run arbitrary SQL, optionally capturing the result as a dataset
        (reference betl/dataflow/dfl_customCode.py:4-25, dbIO.py:55-73).

        Every dataset in the dataflow is visible as a temp view, so SQL
        and the operator vocabulary compose over the same names. This is
        the engine's full Spark-SQL surface — a capability superset of
        the reference's pass-through-to-Postgres.
        """
        with self.journal.step("customSQL", desc or "customSQL"):
            for name, df in self.data.items():
                df.createOrReplaceTempView(name)
            out = self.spark.sql(sql)
            if dataset is not None:
                self.data[dataset] = out
                return out
            return out

    def applyFunctionToColumns(
        self,
        dataset: str,
        function: Callable[[pd.Series], pd.Series],
        columns: str | list[str],
        targetColumns: str | list[str] | None = None,
        returnType: str = "string",
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Vectorized column transform: ``new = f(series)``
        (reference betl/dataflow/dfl_customCode.py:28-58).

        The reference applies a Python function to a whole pandas Series;
        the exact Spark equivalent is a pandas UDF — Arrow-batched,
        so ``f`` still sees real pandas Series, ~10-100× faster than a
        row-at-a-time UDF.
        """
        with self.journal.step("applyFunctionToColumns", desc or f"applyFn {dataset}"):
            df = self._get(dataset)
            cols = [columns] if isinstance(columns, str) else list(columns)
            if targetColumns is None:
                targets = cols
            else:
                targets = [targetColumns] if isinstance(targetColumns, str) else list(targetColumns)
            fn = F.pandas_udf(function, returnType)
            for src, tgt in zip(cols, targets):
                df = df.withColumn(tgt, fn(F.col(src)))
            self.data[targetDataset or dataset] = df
        return df

    def applyFunctionToRows(
        self,
        dataset: str,
        function: Callable,
        desc: str = "",
    ) -> None:
        """Call ``f(row)`` per row for side effects; return value ignored
        (reference betl/dataflow/dfl_customCode.py:61-73 itertuples loop).
        Runs distributed via ``foreachPartition`` — ``f`` must be
        serializable and side-effect targets must be reachable from
        executors."""
        with self.journal.step("applyFunctionToRows", desc or f"applyRows {dataset}"):
            def _run(rows):
                for r in rows:
                    function(r)

            self._get(dataset).foreachPartition(_run)
