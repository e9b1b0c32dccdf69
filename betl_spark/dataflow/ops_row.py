"""Row-level operators: dedupe, filter, filterWhereNotIn
(reference betl/dataflow/dfl_changeRow.py).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column as SparkCol, DataFrame, functions as F

_FILTER_OPS = {
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "in": lambda c, v: c.isin(list(v)),
    "not in": lambda c, v: ~c.isin(list(v)),
}


class RowOps:
    def dedupe(self, dataset: str, targetDataset: str | None = None, desc: str = "") -> DataFrame:
        """Drop duplicate rows over all columns
        (reference betl/dataflow/dfl_changeRow.py:23-34 drop_duplicates).
        Spark ``distinct`` = a hash aggregate with map-side partial
        combine — shuffles only unique rows per partition."""
        with self.journal.step("dedupe", desc or f"dedupe {dataset}"):
            out = self._get(dataset).distinct()
            self.data[targetDataset or dataset] = out
        return out

    def filter(
        self,
        dataset: str,
        filters: dict[str, Any],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Per-column predicates ANDed together
        (reference betl/dataflow/dfl_changeRow.py:37-93).

        ``filters`` maps column → plain value (equality) or
        ``(op, value)`` with op ∈ >, <, >=, <=, ==, !=, in, not in.

        DEVIATIONS from the reference, by design (SURVEY §2.14.1-2):
        the reference's '<' branch applies '>' (dfl_changeRow.py:57-60)
        — implemented correctly here; and with multiple filters the
        reference re-reads the source per filter so only the last lands
        (dfl_changeRow.py:47-51) — predicates compose with AND here.
        """
        with self.journal.step("filter", desc or f"filter {dataset}"):
            df = self._get(dataset)
            preds: list[SparkCol] = []
            for col, spec in filters.items():
                if isinstance(spec, tuple):
                    op, val = spec
                    if op not in _FILTER_OPS:
                        raise ValueError(f"unknown filter op {op!r}")
                    preds.append(_FILTER_OPS[op](F.col(col), val))
                else:
                    preds.append(F.col(col) == spec)
            out = df.filter(reduce(lambda a, b: a & b, preds)) if preds else df
            self.data[targetDataset or dataset] = out
        return out

    def filterWhereNotIn(
        self,
        datasetToBeFiltered: str,
        columnsToBeFiltered: list[str],
        datasetToFilterBy: str,
        columnsToFilterBy: list[str],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Anti-join: keep rows whose key tuple does NOT appear in the
        filter-by dataset (reference betl/dataflow/dfl_changeRow.py:96-162).

        The reference concatenates multi-columns into a synthetic
        ``...pwqnct`` key and mutates both inputs; Spark's native
        multi-column ``left_anti`` join needs neither. Catalyst will
        broadcast the filter-by side when it is small — the common case.
        """
        with self.journal.step(
            "filterWhereNotIn", desc or f"filterWhereNotIn {datasetToBeFiltered}"
        ):
            left = self._get(datasetToBeFiltered)
            right = self._get(datasetToFilterBy).select(
                [
                    F.col(fc).alias(lc)
                    for lc, fc in zip(columnsToBeFiltered, columnsToFilterBy)
                ]
            )
            out = left.join(right, on=list(columnsToBeFiltered), how="left_anti")
            self.data[targetDataset or datasetToBeFiltered] = out
        return out
