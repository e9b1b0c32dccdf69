"""Merge operators: join, cartesian join, union
(reference betl/dataflow/dfl_merge.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "full": "full_outer",
    "full_outer": "full_outer",
    "left_semi": "left_semi",  # capability superset (SURVEY §2.3)
    "left_anti": "left_anti",
}


class MergeOps:
    def join(
        self,
        datasets: list[str],
        targetDataset: str,
        how: str = "inner",
        joinCol: str | list[str] | None = None,
        leftJoinCol: str | list[str] | None = None,
        rightJoinCol: str | list[str] | None = None,
        keepCols: list[str] | None = None,
        cartesianJoin: bool = False,
        broadcastRight: bool = False,
        desc: str = "",
    ) -> DataFrame:
        """Two-table equi-join (reference betl/dataflow/dfl_merge.py:5-54).

        Exactly two datasets, like the reference (>2 rejected at
        dfl_merge.py:12-13); ``how`` passes through to Catalyst, which
        picks broadcast / shuffled-hash / sort-merge per side sizes +
        AQE. ``broadcastRight=True`` force-hints the right side — use it
        when the right side is a dimension/key map the optimizer cannot
        size (e.g. freshly computed).

        Cartesian joins become native ``crossJoin`` instead of the
        reference's constant-key trick (dfl_merge.py:22-27,37-41).
        """
        with self.journal.step("join", desc or f"join {datasets} -> {targetDataset}"):
            if len(datasets) != 2:
                raise ValueError("join takes exactly two datasets (reference dfl_merge.py:12)")
            left, right = (self._get(d) for d in datasets)
            if cartesianJoin:
                out = left.crossJoin(right)
            else:
                if joinCol is not None:
                    on = [joinCol] if isinstance(joinCol, str) else list(joinCol)
                elif leftJoinCol is not None and rightJoinCol is not None:
                    lc = [leftJoinCol] if isinstance(leftJoinCol, str) else list(leftJoinCol)
                    rc = [rightJoinCol] if isinstance(rightJoinCol, str) else list(rightJoinCol)
                    right = right.withColumnsRenamed(dict(zip(rc, lc)))
                    on = lc
                else:
                    raise ValueError("joinCol or left/rightJoinCol required")
                if broadcastRight:
                    right = F.broadcast(right)
                out = left.join(right, on=on, how=_HOW_MAP.get(how, how))
            if keepCols:
                out = out.select(*keepCols)
            self.data[targetDataset] = out
        return out

    def union(
        self,
        datasets: list[str],
        targetDataset: str,
        desc: str = "",
    ) -> DataFrame:
        """N-way union aligned by column name
        (reference betl/dataflow/dfl_merge.py:57-83 pd.concat).

        Mismatched column sets raise with both sorted column lists, like
        the reference's error report (dfl_merge.py:66-76).
        """
        with self.journal.step("union", desc or f"union {datasets}"):
            dfs = [self._get(d) for d in datasets]
            base = sorted(dfs[0].columns)
            for name, df in zip(datasets[1:], dfs[1:]):
                if sorted(df.columns) != base:
                    raise ValueError(
                        f"union column mismatch: {datasets[0]} has {base}, "
                        f"{name} has {sorted(df.columns)}"
                    )
            out = reduce(lambda a, b: a.unionByName(b), dfs)
            self.data[targetDataset] = out
        return out
