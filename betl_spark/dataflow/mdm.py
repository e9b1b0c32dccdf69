"""Master-data mapping (reference betl/dataflow/dfl_mdm.py:8-213).

The reference syncs a human-curated mapping table in a Google Sheet with
the data: full-outer join, auto-populate unmapped values, write the
distinct observed combinations + occurrence counts back to the sheet,
and alert on unmapped rows.

Here the mapping store is pluggable: any object with ``read() ->
DataFrame-able rows`` and ``write(rows)``; a gspread-backed store can be
layered on driver-side without touching this logic. The join +
precedence semantics are reproduced exactly:

1. blanks in the data join to blank sheet cells ('' fill, :39-43);
2. auto-populate fills a mapping column only where the sheet left it
   empty — never overwriting curated values (:83-88);
3. output keeps all non-``right_only`` rows (:122-126), mapping NaN→'';
4. write-back = distinct (joinCols ∪ masterDataCols) + count, sorted
   desc (:133-180);
5. unmapped rows raise an alert (:186-197).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from betl_spark.io.writers import null_to_empty
from betl_spark.schema.registry import all_string_schema


class MappingStore:
    """In-memory mapping store standing in for the reference's GSheet
    worksheet (dfl_mdm.py:22-36). ``rows`` = list of lists, first row =
    header."""

    def __init__(self, rows: list[list[str]] | None = None):
        self.rows = rows or []
        self.alerts: list[str] = []

    def read_df(self, spark) -> DataFrame:
        header, *data = self.rows
        return spark.createDataFrame(
            [[("" if v is None else str(v)) for v in r] for r in data],
            schema=all_string_schema([str(h) for h in header]),
        )

    def write_rows(self, header: list[str], data: list[list[str]]) -> None:
        self.rows = [header] + data

    def alert(self, msg: str) -> None:
        # reference writes an alerts file (betl/logger/alerts.py:4-12)
        self.alerts.append(msg)


class MDMOps:
    def mapMasterData(
        self,
        dataset: str,
        mdmStore: MappingStore,
        joinCols: list[str],
        masterDataCols: list[str],
        autoPopMappingCols: list[str] | None = None,
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        with self.journal.step("mapMasterData", desc or f"mdm {dataset}"):
            autoPopMappingCols = autoPopMappingCols or []
            data = null_to_empty(self._get(dataset))  # :39-43
            mapping = mdmStore.read_df(self.spark)

            # auto-pop sources renamed out of the way (:58-64)
            auto_renames = {c: f"autoPop_{c}" for c in autoPopMappingCols}
            data = data.withColumnsRenamed(auto_renames)

            # full outer join with merge indicator (:70-75)
            left = data.withColumn("__in_data__", F.lit(1))
            right = mapping.withColumn("__in_map__", F.lit(1))
            joined = left.join(right, on=list(joinCols), how="full_outer")

            # auto-populate only where the sheet is empty/null (:83-88)
            for c in autoPopMappingCols:
                joined = joined.withColumn(
                    c,
                    F.when(
                        F.col(c).isNull() | (F.col(c) == ""), F.col(f"autoPop_{c}")
                    ).otherwise(F.col(c)),
                )
            joined = joined.drop(*[f"autoPop_{c}" for c in autoPopMappingCols])

            # match accounting (:90-95) — single job over a cached plan
            joined = joined.cache()
            counts = (
                joined.groupBy(
                    F.col("__in_data__").isNotNull().alias("in_data"),
                    F.col("__in_map__").isNotNull().alias("in_map"),
                )
                .count()
                .collect()
            )
            stats = {(r["in_data"], r["in_map"]): r["count"] for r in counts}
            matched = stats.get((True, True), 0)
            data_only = stats.get((True, False), 0)

            # output = all non-right_only rows, mapping nulls → '' (:116-126)
            out = joined.filter(F.col("__in_data__").isNotNull()).drop(
                "__in_data__", "__in_map__"
            )
            out = null_to_empty(out)

            # write-back: distinct combos + occurrence count, sorted desc (:133-180)
            wb_cols = list(joinCols) + [c for c in masterDataCols if c not in joinCols]
            write_back = (
                out.groupBy(*wb_cols)
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.desc("count"), *wb_cols)
            )
            rows = [
                [("" if v is None else str(v)) for v in r]
                for r in write_back.collect()
            ]
            mdmStore.write_rows(wb_cols + ["count"], rows)

            if data_only > 0:  # :186-197
                mdmStore.alert(
                    f"{data_only} rows of {dataset} have no master-data mapping "
                    f"({matched} matched)"
                )
            self.data[targetDataset or dataset] = out
        return out
