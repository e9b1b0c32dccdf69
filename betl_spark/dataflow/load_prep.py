"""Load-prep operators (reference betl/dataflow/dfl_loadPrep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class LoadPrepOps:
    def collapseNaturalKeyCols(
        self,
        dataset: str,
        naturalKeyCols: dict[str, list[str]],
        targetDataset: str | None = None,
        desc: str = "",
    ) -> DataFrame:
        """Concatenate multiple NK source columns into one '_'-separated
        natural-key string per target column, dropping the sources
        (reference betl/dataflow/dfl_loadPrep.py:28-69). Pure
        ``concat_ws`` — stays inside whole-stage codegen."""
        with self.journal.step("collapseNaturalKeyCols", desc or f"collapseNK {dataset}"):
            df = self._get(dataset)
            for target, sources in naturalKeyCols.items():
                df = df.withColumn(
                    target,
                    F.concat_ws(
                        "_", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in sources]
                    ),
                )
                df = df.drop(*[c for c in sources if c != target])
            self.data[targetDataset or dataset] = df
        return df

    def prepForLoad(
        self,
        dataset: str,
        targetTableName: str | None = None,
        naturalKeyCols: dict[str, list[str]] | None = None,
        desc: str = "",
    ) -> None:
        """Optionally collapse NKs then write to the LOD staging layer
        (reference betl/dataflow/dfl_loadPrep.py:3-25 — always file,
        never DB)."""
        if naturalKeyCols:
            self.collapseNaturalKeyCols(dataset, naturalKeyCols)
        self.write(
            dataset,
            targetTableName or dataset,
            "LOD",
            keepDataflowOpen=True,
            desc=desc or f"prepForLoad {dataset}",
        )
